"""Golden-database regression tests — the reference's end-to-end golden test
(``tests/test-db-build.sh``) with goldens that are actually committed (the
reference's live behind git-lfs stubs, SURVEY.md gap G2) and a diff that
actually fails.

Configs mirror the reference CI shapes: DNA k=7 omega=2.0 (D652-style) and
amino k=4 omega=10.0 (D140-style), with AR replayed from committed fixtures.
A byte-level mismatch here means the build semantics or the serialization
format drifted — both are release-blocking.
"""

import os

import pytest

from ipk_tpu.pipeline import BuildParams, build_database
from ipk_tpu.tools import diff_databases

DATA = os.path.join(os.path.dirname(__file__), "data", "golden")


@pytest.mark.parametrize("proj,states,k,omega,golden", [
    ("D-dna", "nucl", 7, 2.0, "DB_k7_o2.0.ipk"),
    ("D-aa", "amino", 4, 10.0, "DB_k4_o10.ipk"),
])
def test_rebuild_matches_golden(tmp_path, proj, states, k, omega, golden):
    root = os.path.join(DATA, proj)
    out = str(tmp_path / "DB.ipk")
    params = BuildParams(
        refalign=os.path.join(root, "reference.fasta"),
        reftree=os.path.join(root, "tree.newick"),
        states=states, working_dir=str(tmp_path / "wd"),
        ar_dir=os.path.join(root, "ar_out"),
        kmer_size=k, omega=omega, output_filename=out, verbosity=0)
    build_database(params)
    # the contract is the exact decompressed PAYLOAD (every header field,
    # column byte, row order) — robust to compression-strategy changes
    # (r4: parallel deflate produces different block boundaries than the
    # serial writer that produced the committed goldens)
    import zlib

    def payload(path):
        raw = open(path, "rb").read()
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return raw

    assert payload(out) == payload(os.path.join(root, golden)), (
        "Rebuilt DB differs from committed golden — semantics or format "
        "drifted. Run ipk_tpu diff for details.")
    # the structured diff agrees
    assert diff_databases(out, os.path.join(root, golden))
    # writer determinism: same DB → byte-identical file
    build_database(BuildParams(
        refalign=os.path.join(root, "reference.fasta"),
        reftree=os.path.join(root, "tree.newick"),
        states=states, working_dir=str(tmp_path / "wd2"),
        ar_dir=os.path.join(root, "ar_out"),
        kmer_size=k, omega=omega,
        output_filename=str(tmp_path / "DB2.ipk"), verbosity=0))
    assert (open(out, "rb").read()
            == open(str(tmp_path / "DB2.ipk"), "rb").read())
