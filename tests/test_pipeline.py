"""End-to-end pipeline tests using synthetic --ar-dir fixtures.

The minimum end-to-end slice of SURVEY.md §7.3 phase 1: host.io → ar replay →
dense enumeration → filter → serializer, validated against the list-based
DCLA oracle and via .ipk round-trips.
"""

import os

import numpy as np
import pytest

from ipk_tpu import serialize
from ipk_tpu.builder import log_threshold_f32
from ipk_tpu.pipeline import BuildParams, build_database
from ipk_tpu.seq import DNA, decode_kmer
from ipk_tpu.tree import load_newick, parse_newick, postorder
from ipk_tpu.ar.reader import read_ancestral_probs
from ipk_tpu.ar.mapping import map_nodes, ghost_groups

from fixtures import make_project
from oracle_dcla import dcla_matrix_max


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("proj")
    tree_file, fasta_file, ar_dir = make_project(tmp, num_leaves=6, width=30)
    workdir = str(tmp / "work")
    params = BuildParams(
        refalign=fasta_file, reftree=tree_file, states="nucl",
        working_dir=workdir, ar_dir=ar_dir, kmer_size=5, omega=1.5,
        output_filename=os.path.join(workdir, "DB.ipk"), verbosity=0)
    result = build_database(params)
    return params, result


def test_build_produces_db(project):
    params, result = project
    db = result.db
    assert db.kmer_size == 5
    assert db.omega == pytest.approx(1.5)
    assert db.sequence_type == "nucl"
    assert db.size() > 0
    assert result.num_explored >= db.num_entries()


def test_artifacts_written(project):
    params, _ = project
    wd = params.working_dir
    assert os.path.exists(os.path.join(wd, "align.reduced.fasta"))
    assert os.path.exists(os.path.join(wd, "extended_trees/extended_tree.newick"))
    assert os.path.exists(os.path.join(wd, "extended_trees/extended_align.fasta"))
    assert os.path.exists(os.path.join(wd, "extended_trees/extended_align.phylip"))
    assert os.path.exists(os.path.join(wd, "DB.ipk"))


def test_branch_ids_are_original_postorder(project):
    params, result = project
    original = load_newick(params.reftree)
    n = original.get_node_count()
    root_pid = original.root.postorder_id
    all_branches = set(result.db.branches.tolist())
    assert all(0 <= b < n for b in all_branches)
    assert root_pid not in all_branches  # root excluded (db_builder.cpp:535-539)


def test_filter_order_ascending(project):
    _, result = project
    fv = result.db.filter_values
    assert (np.diff(fv.astype(np.float64)) >= -1e-12).all()


def test_scores_match_oracle(project):
    """Per-branch max-merged scores equal the list-based DCLA oracle run over
    both ghost matrices of a branch."""
    params, result = project
    db = result.db

    original = load_newick(params.reftree)
    from ipk_tpu.tree import preprocess_tree
    original2, extended, ghost_mapping = preprocess_tree(params.reftree)
    ar_tree = load_newick(os.path.join(params.ar_dir,
                                       "align.raxml.ancestralTree"))
    ar_mapping = map_nodes(extended, ar_tree)
    label_rows, P = read_ancestral_probs(
        os.path.join(params.ar_dir, "align.raxml.ancestralProbs"), DNA)
    groups, group_ids = ghost_groups(extended, original2, ghost_mapping)
    eps = log_threshold_f32(params.omega, 4, params.kmer_size)

    # oracle for the first two groups
    db_by_key = {key: dict(entries) for key, entries in db}
    for gi in [0, 1]:
        merged = {}
        for label in groups[gi]:
            Pm = P[label_rows[ar_mapping[label]]]
            for key, score in dcla_matrix_max(
                    Pm, params.kmer_size, eps, bits=2).items():
                if key not in merged or merged[key] < score:
                    merged[key] = score
        bid = group_ids[gi]
        for key, score in merged.items():
            assert key in db_by_key, decode_kmer(key, params.kmer_size)
            assert bid in db_by_key[key]
            assert np.float32(db_by_key[key][bid]) == np.float32(score)
        # no spurious entries for this branch
        count = sum(1 for e in db_by_key.values() if bid in e)
        assert count == len(merged)


def test_serialization_roundtrip(project):
    params, result = project
    loaded = serialize.load(params.output_filename)
    db = result.db
    assert loaded.kmer_size == db.kmer_size
    assert loaded.omega == np.float32(db.omega)
    assert loaded.sequence_type == db.sequence_type
    assert loaded.tree == db.tree
    assert len(loaded.tree_index) == len(db.tree_index)
    np.testing.assert_array_equal(loaded.keys, db.keys)
    np.testing.assert_array_equal(loaded.filter_values, db.filter_values)
    np.testing.assert_array_equal(loaded.offsets, db.offsets)
    np.testing.assert_array_equal(loaded.branches, db.branches)
    np.testing.assert_array_equal(loaded.scores, db.scores)


def test_uncompressed_roundtrip(project, tmp_path):
    params, result = project
    raw = str(tmp_path / "DB_raw.ipk")
    serialize.save(result.db, raw, compressed=False)
    loaded = serialize.load(raw)
    np.testing.assert_array_equal(loaded.keys, result.db.keys)
    np.testing.assert_array_equal(loaded.scores, result.db.scores)
    # compressed file is smaller but equal content
    assert os.path.getsize(raw) > os.path.getsize(params.output_filename)


def test_deterministic_rebuild(project, tmp_path):
    """Same inputs → byte-identical database (stricter than the reference's
    EPS=1e-2 ipkdiff, per BASELINE.md)."""
    params, _ = project
    out2 = str(tmp_path / "DB2.ipk")
    params2 = BuildParams(**{**params.__dict__,
                             "working_dir": str(tmp_path / "w2"),
                             "output_filename": out2})
    build_database(params2)
    with open(params.output_filename, "rb") as a, open(out2, "rb") as b:
        assert a.read() == b.read()


def test_random_filter(project, tmp_path):
    params, _ = project
    out2 = str(tmp_path / "DBr.ipk")
    params2 = BuildParams(**{**params.__dict__, "filter": "random",
                             "working_dir": str(tmp_path / "w3"),
                             "output_filename": out2})
    result = build_database(params2)
    db = serialize.load(out2)
    # same k-mer set as mif0, different order
    orig = serialize.load(params.output_filename)
    assert set(db.keys.tolist()) == set(orig.keys.tolist())
    # values follow the libstdc++ minstd_rand0(42) stream sorted ascending
    from ipk_tpu.core.filter import minstd0_uniform_stream
    expected = np.sort(minstd0_uniform_stream(db.size()).astype(np.float32))
    np.testing.assert_array_equal(np.sort(db.filter_values), expected)


def test_ar_only(project, tmp_path):
    params, _ = project
    params2 = BuildParams(**{**params.__dict__, "ar_only": True,
                             "working_dir": str(tmp_path / "w4")})
    assert build_database(params2) is None
