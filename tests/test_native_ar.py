"""Native ancestral reconstruction vs a brute-force enumeration oracle.

For tiny trees we can enumerate every assignment of states to internal nodes
and compute exact marginal posteriors — the strongest possible check of the
two-pass pruning implementation.
"""

import itertools

import numpy as np
import pytest

from ipk_tpu.alignment import Alignment
from ipk_tpu.ar.native import (ancestral_posteriors, empirical_frequencies,
                               gamma_category_rates, gtr_eigendecomposition,
                               run_native_ar)
from ipk_tpu.seq import DNA
from ipk_tpu.tree import parse_newick, postorder


def expm_transition(lam, U, U_inv, t):
    return (U * np.exp(lam * t)[None, :]) @ U_inv


def brute_force_posteriors(tree, align, freqs, lam, U, U_inv, cat_rates):
    """Enumerate internal-state assignments; exact marginal posteriors."""
    nodes = list(postorder(tree.root))
    internal = [n for n in nodes if not n.is_leaf()]
    leaves = {n.label: n for n in nodes if n.is_leaf()}
    sigma = len(freqs)
    S = align.width
    lut = DNA.codes_lut()
    seq_codes = {h: lut[np.frombuffer(s.encode(), np.uint8)]
                 for h, s in zip(align.headers, align.sequences)}

    posts = np.zeros((len(internal), S, sigma))
    for site in range(S):
        accum = np.zeros((len(internal), sigma))
        total = 0.0
        for cat_rate in cat_rates:
            P = {id(n): expm_transition(lam, U, U_inv,
                                        n.branch_length * cat_rate)
                 for n in nodes}
            for assign in itertools.product(range(sigma),
                                            repeat=len(internal)):
                state = {id(v): s for v, s in zip(internal, assign)}
                lik = freqs[state[id(tree.root)]]
                ok = True
                for n in nodes:
                    if n.parent is None:
                        continue
                    ps = state.get(id(n.parent))
                    if n.is_leaf():
                        code = seq_codes[n.label][site]
                        if code < 0:  # gap: marginalize the leaf
                            contrib = 1.0
                            lik *= sum(P[id(n)][ps, y] for y in range(sigma))
                            continue
                        lik *= P[id(n)][ps, code]
                    else:
                        lik *= P[id(n)][ps, state[id(n)]]
                if not ok:
                    continue
                for vi, v in enumerate(internal):
                    accum[vi, state[id(v)]] += lik
                total += lik
        posts[:, site, :] = accum / total
    return internal, posts


@pytest.mark.parametrize("categories", [1, 4])
def test_posteriors_match_brute_force(categories):
    tree = parse_newick("((a:0.3,b:0.8)x:0.4,(c:0.2,d:1.1)y:0.6)r;")
    align = Alignment(["a", "b", "c", "d"],
                      ["ACGTA", "ACGTC", "AGTTA", "A-GTA"])
    freqs = empirical_frequencies(align, DNA)
    lam, U, U_inv = gtr_eigendecomposition(freqs)
    cat_rates = gamma_category_rates(1.0, categories)

    internal, got = ancestral_posteriors(tree, align, DNA, alpha=1.0,
                                         categories=categories)
    internal_bf, expected = brute_force_posteriors(tree, align, freqs, lam,
                                                   U, U_inv, cat_rates)
    assert [n.label for n in internal] == [n.label for n in internal_bf]
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)


def test_posteriors_sum_to_one():
    tree = parse_newick("((a:0.3,b:0.8)x:0.4,c:0.5)r;")
    align = Alignment(["a", "b", "c"], ["ACGT", "ACGA", "TCGA"])
    _, posts = ancestral_posteriors(tree, align, DNA)
    np.testing.assert_allclose(posts.sum(axis=2), 1.0, rtol=1e-5)


def test_zero_branch_length_pins_posterior():
    """A leaf attached with ~zero branch length forces its parent's state."""
    tree = parse_newick("((a:0.0001,b:0.5)x:0.5,c:0.5)r;")
    align = Alignment(["a", "b", "c"], ["AAAA", "CCCC", "GGGG"])
    internal, posts = ancestral_posteriors(tree, align, DNA)
    x = [i for i, n in enumerate(internal) if n.label == "x"][0]
    assert (posts[x, :, 0] > 0.95).all()  # state A dominates at x


def test_gamma_rates_mean_one():
    for alpha in [0.3, 1.0, 5.0]:
        rates = gamma_category_rates(alpha, 4)
        assert rates.shape == (4,)
        assert abs(rates.mean() - 1.0) < 1e-9
        assert (np.diff(rates) > 0).all()
    np.testing.assert_array_equal(gamma_category_rates(1.0, 1), [1.0])


def test_gtr_eigendecomposition_properties():
    freqs = np.array([0.1, 0.2, 0.3, 0.4])
    lam, U, U_inv = gtr_eigendecomposition(freqs)
    Q = (U * lam[None, :]) @ U_inv
    np.testing.assert_allclose(Q.sum(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(-(freqs * np.diag(Q)).sum(), 1.0, rtol=1e-12)
    # stationarity: pi Q = 0
    np.testing.assert_allclose(freqs @ Q, 0.0, atol=1e-12)
    # P(t) rows are distributions
    P = expm_transition(lam, U, U_inv, 0.7)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, rtol=1e-10)
    assert (P >= -1e-12).all()


def test_run_native_ar_artifacts(tmp_path):
    from ipk_tpu.tree import extend_tree
    from ipk_tpu.alignment import extend_alignment
    from ipk_tpu.ar.reader import read_ancestral_probs
    from ipk_tpu.ar.mapping import map_nodes
    from ipk_tpu.tree import load_newick

    tree = parse_newick("((a:0.3,b:0.8)x:0.4,c:0.5)r;")
    ext, _ = extend_tree(tree)
    align = Alignment(["a", "b", "c"], ["ACGTAC", "ACGTAA", "TCGTAC"])
    ext_align = extend_alignment(align, ext)
    probs, tree_path = run_native_ar(ext, ext_align, str(tmp_path), DNA)
    # artifacts round-trip through the standard reader + node mapping
    label_rows, P = read_ancestral_probs(probs, DNA)
    ar_tree = load_newick(tree_path)
    mapping = map_nodes(ext, ar_tree)
    assert ext.get_node_count() == ar_tree.get_node_count()
    ghosts = [l for l in mapping if l.endswith("_X0")]
    assert all(mapping[g] in label_rows for g in ghosts)
    assert P.shape[1] == ext_align.width
    # probabilities: finite log10, rows normalized
    lin = np.power(10.0, P.astype(np.float64))
    np.testing.assert_allclose(lin.sum(axis=2), 1.0, atol=1e-5)


def test_full_build_with_native_ar(tmp_path):
    """End-to-end: --ar native replaces raxml-ng; DB builds and loads."""
    from fixtures import make_project
    from ipk_tpu.pipeline import BuildParams, build_database
    from ipk_tpu import serialize

    tree_file, fasta_file, _ = make_project(tmp_path, num_leaves=5, width=24,
                                            seed=77)
    out = str(tmp_path / "DB.ipk")
    params = BuildParams(refalign=fasta_file, reftree=tree_file,
                         states="nucl", working_dir=str(tmp_path / "wd"),
                         ar_binary="native", kmer_size=4, omega=1.5,
                         output_filename=out, verbosity=0)
    result = build_database(params)
    assert result.db.size() > 0
    db = serialize.load(out)
    assert db.kmer_size == 4
    # AR artifacts written under workdir/AR and replayable via --ar-dir
    import os
    ar_dir = str(tmp_path / "wd" / "AR")
    assert os.path.exists(os.path.join(ar_dir,
                                       "native.raxml.ancestralProbs"))
    out2 = str(tmp_path / "DB2.ipk")
    params2 = BuildParams(**{**params.__dict__, "ar_binary": "",
                             "ar_dir": ar_dir,
                             "working_dir": str(tmp_path / "wd2"),
                             "output_filename": out2})
    build_database(params2)
    with open(out, "rb") as a, open(out2, "rb") as b:
        assert a.read() == b.read()
