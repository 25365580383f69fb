"""AR bridge + reader tests: TSV parsing (native and Python paths), replay,
node mapping, raxml argv parity."""

import os
import subprocess

import numpy as np
import pytest

from ipk_tpu.ar.bridge import ArParameters, RaxmlWrapper, guess_software
from ipk_tpu.ar.mapping import ghost_groups, gather_ghost_tensor, map_nodes
from ipk_tpu.ar.reader import (aa_permutation, read_ancestral_probs,
                               RAXML_AA_ORDER, _load_native)
from ipk_tpu.seq import AA, DNA
from ipk_tpu.tree import parse_newick, extend_tree

from fixtures import make_ar_dir, make_ar_tree, write_ancestral_probs


def test_aa_permutation():
    perm = aa_permutation()
    # out column 0 is 'R', which sits at index 1 of raxml order "ARND..."
    assert RAXML_AA_ORDER[perm[0]] == "R"
    assert AA.letters == "".join(RAXML_AA_ORDER[i] for i in perm)


def write_probs(tmp_path, rows, sigma=4):
    p = tmp_path / "x.raxml.ancestralProbs"
    with open(p, "w") as f:
        f.write("Node\tSite\tState\t" +
                "\t".join(f"p{i}" for i in range(sigma)) + "\n")
        for node, site, probs in rows:
            f.write(f"{node}\t{site}\t{'A'}\t" +
                    "\t".join(f"{x:.9f}" for x in probs) + "\n")
    return str(p)


def test_read_probs_log10_and_order(tmp_path):
    f = write_probs(tmp_path, [
        ("Node1", 1, [0.1, 0.2, 0.3, 0.4]),
        ("Node1", 2, [0.25, 0.25, 0.25, 0.25]),
        ("Node2", 1, [1.0, 0.0, 0.0, 0.0]),
        ("Node2", 2, [0.5, 0.5, 0.0, 0.0]),
    ])
    label_rows, P = read_ancestral_probs(f, DNA)
    assert label_rows == {"Node1": 0, "Node2": 1}
    assert P.shape == (2, 2, 4)
    assert P.dtype == np.float32
    np.testing.assert_allclose(P[0, 0], np.log10([0.1, 0.2, 0.3, 0.4]).astype(np.float32), rtol=1e-6)
    assert P[1, 0, 1] == -np.inf  # log10(0)


def test_native_matches_python(tmp_path):
    if _load_native() is None:
        pytest.skip("native parser not built")
    rng = np.random.default_rng(0)
    rows = []
    for node in ["NodeA", "NodeB", "NodeC"]:
        for site in range(5):
            rows.append((node, site + 1, rng.dirichlet(np.ones(4))))
    f = write_probs(tmp_path, rows)
    lr_native, P_native = read_ancestral_probs(f, DNA)
    os.environ["IPK_TPU_NO_NATIVE"] = "1"
    try:
        lr_py, P_py = read_ancestral_probs(f, DNA)
    finally:
        del os.environ["IPK_TPU_NO_NATIVE"]
    assert lr_native == lr_py
    np.testing.assert_array_equal(P_native, P_py)


def test_read_probs_unequal_blocks(tmp_path):
    f = write_probs(tmp_path, [
        ("Node1", 1, [0.25] * 4),
        ("Node2", 1, [0.25] * 4),
        ("Node2", 2, [0.25] * 4),
    ])
    with pytest.raises(RuntimeError, match="unequal"):
        read_ancestral_probs(f, DNA)


def test_raxml_args_parity():
    """argv must match the reference's exact raxml-ng invocation
    (ar.cpp:663-707)."""
    params = ArParameters(binary_file="raxml-ng", model="GTR", alpha=1.0,
                          categories=4, num_threads=2,
                          tree_file="t.nwk", alignment_file="a.phylip")
    args = RaxmlWrapper(params).make_args()
    assert args[:13] == ["--ancestral", "--msa", "a.phylip", "--tree", "t.nwk",
                         "--threads", "2", "--precision", "9", "--seed", "1",
                         "--force", "msa"]
    assert "--redo" in args
    i = args.index("--model")
    assert args[i + 1] == "GTR+G4{1.0}+IU{0}+FC"
    assert args[args.index("--blopt") + 1] == "nr_safe"


def test_raxml_raw_parameters_passthrough():
    params = ArParameters(ar_parameters="--model GTR+G --opt-model off")
    args = RaxmlWrapper(params).make_args()
    assert "--opt-model" in args and "off" in args
    assert "--blopt" not in args  # raw params replace the model block


def test_ar_dir_replay(tmp_path):
    tree = parse_newick("((a:1,b:1)x:1,c:1)r;")
    ext, _ = extend_tree(tree)
    ar_dir, _ = make_ar_dir(tmp_path, ext, width=10)
    params = ArParameters(ar_dir=ar_dir)
    probs, treef = RaxmlWrapper(params).run()
    assert probs.endswith(".raxml.ancestralProbs")
    assert treef.endswith(".raxml.ancestralTree")


def test_ar_dir_missing(tmp_path):
    params = ArParameters(ar_dir=str(tmp_path))
    with pytest.raises(RuntimeError, match="Could not find"):
        RaxmlWrapper(params).run()


def test_guess_software(tmp_path):
    fake = tmp_path / "fake-raxml"
    fake.write_text("#!/bin/sh\necho 'RAxML-NG 1.2.0 help'\n")
    fake.chmod(0o755)
    assert guess_software(str(fake), str(tmp_path / "w")) == "raxml-ng"
    fake2 = tmp_path / "fake-other"
    fake2.write_text("#!/bin/sh\necho 'something else'\n")
    fake2.chmod(0o755)
    with pytest.raises(RuntimeError, match="Unsupported"):
        guess_software(str(fake2), str(tmp_path / "w"))


def test_map_nodes_and_gather(tmp_path):
    tree = parse_newick("((a:1,b:1)x:1,c:1)r;")
    ext, ghost_mapping = extend_tree(tree)
    ar_tree = make_ar_tree(ext)
    mapping = map_nodes(ext, ar_tree)
    # leaves map to themselves, ghosts to NodeN labels
    assert mapping["a"] == "a"
    ghost_labels = [l for l in mapping if l.endswith("_X0")]
    assert all(mapping[g].startswith("Node") for g in ghost_labels)

    rng = np.random.default_rng(0)
    probs_file = str(tmp_path / "p.raxml.ancestralProbs")
    write_ancestral_probs(probs_file, ar_tree, 10, rng, DNA)
    label_rows, P = read_ancestral_probs(probs_file, DNA)
    groups, ids = ghost_groups(ext, tree, ghost_mapping)
    tensor = gather_ghost_tensor(groups, mapping, label_rows, P)
    assert tensor.shape == (len(groups) * 2, 10, 4)
    # row order: groups-major, [X1, X0] within group
    first = groups[0]
    assert first[0].endswith("_X1") and first[1].endswith("_X0")
    np.testing.assert_array_equal(tensor[0], P[label_rows[mapping[first[0]]]])


def test_map_nodes_count_mismatch():
    t1 = parse_newick("((a:1,b:1)x:1,c:1)r;")
    t2 = parse_newick("(a:1,b:1)r;")
    with pytest.raises(RuntimeError, match="differ in the number of nodes"):
        map_nodes(t1, t2)


def test_phyml_wrapper_parity(tmp_path):
    """PhyML argv byte-parity (ar.cpp:550-563) + --ar-dir suffix replay
    (ar.cpp:497-537); the pipeline then raises the reference's exact
    reader error (ar.cpp:77-81)."""
    from ipk_tpu.ar.bridge import ArParameters, PhymlWrapper

    p = ArParameters(model="JTT", alpha=0.5, categories=4,
                     tree_file="t.nwk", alignment_file="a.phylip")
    assert PhymlWrapper(p).make_args() == [
        "--ancestral", "--no_memory_check", "-i", "a.phylip", "-u", "t.nwk",
        "-m", "JTT", "-c", "4", "-b", "0", "-v", "0.0", "-o", "r",
        "-a", "0.5", "-f", "e", "--leave_duplicates"]

    (tmp_path / "x_phyml_ancestral_seq.txt").write_text("seq")
    (tmp_path / "x_phyml_ancestral_tree.txt").write_text("(a,b);")
    p2 = ArParameters(ar_dir=str(tmp_path))
    matrix, tree = PhymlWrapper(p2).run()
    assert matrix.endswith("_phyml_ancestral_seq.txt")
    assert tree.endswith("_phyml_ancestral_tree.txt")


def test_phyml_ar_dir_rejected_at_read(tmp_path, dna_project_dir=None):
    """A phyml --ar-dir replay must fail with the reference's message."""
    import pytest
    import pathlib
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_project
    from ipk_tpu.pipeline import BuildParams, build_database

    tree_file, fasta_file, ar_dir = make_project(
        pathlib.Path(tmp_path), num_leaves=6, width=30, seed=3)
    phyml_dir = tmp_path / "phyml_ar"
    phyml_dir.mkdir()
    (phyml_dir / "a_phyml_ancestral_seq.txt").write_text("stub")
    (phyml_dir / "a_phyml_ancestral_tree.txt").write_text("(a,b);")
    params = BuildParams(
        refalign=str(fasta_file), reftree=str(tree_file),
        working_dir=str(tmp_path / "wd"), ar_dir=str(phyml_dir),
        kmer_size=4, output_filename=str(tmp_path / "DB.ipk"), verbosity=0)
    with pytest.raises(RuntimeError,
                       match="PhyML is not supported in this version"):
        build_database(params)
