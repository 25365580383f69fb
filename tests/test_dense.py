"""Cross-check the dense enumeration core against the list-based DCLA oracle.

This is the test the reference never had (SURVEY.md §4: "oracle: brute-force
enumeration for tiny k — trivially checkable against DCLA's output set").
"""

import numpy as np
import pytest

from ipk_tpu.core.dense import (accumulate_ghosts, accumulate_matrix,
                                best_score_prefix, group_max,
                                score_window_block, split_tree)
from ipk_tpu.seq import AA, DNA, key_to_dense_index

from oracle_dcla import dcla_matrix_max, dcla_window


def random_log_matrix(rng, S, sigma):
    """Random log10 posterior matrix: columns are probability distributions."""
    p = rng.dirichlet(np.ones(sigma) * 0.3, size=S).astype(np.float32)
    p = np.maximum(p, 1e-30)
    return np.log10(p).astype(np.float32)


def log_threshold_for(omega, sigma, k):
    return np.float32(np.log10((np.float32(omega) / sigma) ** k))


def test_split_tree_matches_reference_recursion():
    # k=7 splits: (0,7)->(0,3)+(3,4); (0,3)->(0,1)+(1,2); (3,4)->(3,2)+(5,2)...
    spans = split_tree(7)
    assert spans[-1] == (0, 7)
    assert set(spans) == {(0, 1), (1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1),
                          (1, 2), (3, 2), (5, 2), (0, 3), (3, 4), (0, 7)}
    # children precede parents
    seen = set()
    for (j, h) in spans:
        if h > 1:
            hl = h // 2
            assert (j, hl) in seen and (j + hl, h - hl) in seen
        seen.add((j, h))


@pytest.mark.parametrize("k,omega", [(2, 1.0), (3, 1.5), (4, 1.5), (5, 0.5),
                                     (7, 2.0), (8, 1.5)])
def test_window_block_vs_oracle_dna(k, omega):
    rng = np.random.default_rng(k * 100 + int(omega * 10))
    # keep the pure-Python oracle affordable for large survivor sets
    S = 20 if k <= 5 else 10
    P = random_log_matrix(rng, S, 4)
    prefix = best_score_prefix(P)
    eps = log_threshold_for(omega, 4, k)
    W = S - k + 1
    T = np.asarray(score_window_block(P, prefix, 0, k=k, sigma=4,
                                      log_threshold=eps, block_w=W))
    for w in range(W):
        expected = dcla_window(P, w, k, eps, bits=2)
        got = {idx: T[w, idx] for idx in np.nonzero(T[w] > -np.inf)[0]}
        assert set(got) == set(expected), f"window {w} survivor sets differ"
        for key, score in expected.items():
            # identical f32 summation tree -> bit-equal scores
            assert np.float32(score) == np.float32(got[key]), (
                f"window {w} key {key}: {score} vs {got[key]}")


def test_window_block_vs_oracle_aa():
    rng = np.random.default_rng(7)
    S = 10
    k = 3
    P = random_log_matrix(rng, S, 20)
    prefix = best_score_prefix(P)
    eps = log_threshold_for(4.0, 20, k)
    W = S - k + 1
    T = np.asarray(score_window_block(P, prefix, 0, k=k, sigma=20,
                                      log_threshold=eps, block_w=W))
    for w in range(W):
        expected = dcla_window(P, w, k, eps, bits=5)
        # oracle keys are bit-packed; dense index is base-20
        expected_idx = {
            int(key_to_dense_index(np.uint64(key), k, AA)): score
            for key, score in expected.items()}
        got = {int(i): T[w, i] for i in np.nonzero(T[w] > -np.inf)[0]}
        assert set(got) == set(expected_idx)
        for idx, score in expected_idx.items():
            assert np.float32(score) == np.float32(got[idx])


@pytest.mark.parametrize("block_w", [1, 3, 8, 64])
def test_accumulate_matrix_vs_oracle(block_w):
    """Max-over-windows accumulation is block-size invariant and matches the
    oracle's insert-or-max merge, including overlapping tail blocks."""
    rng = np.random.default_rng(42)
    S, k, omega = 25, 4, 1.5
    P = random_log_matrix(rng, S, 4)
    prefix = best_score_prefix(P)
    eps = log_threshold_for(omega, 4, k)
    A = np.asarray(accumulate_matrix(P, prefix, eps, k=k, sigma=4,
                                     block_w=block_w))
    expected = dcla_matrix_max(P, k, eps, bits=2)
    got = {int(i): A[i] for i in np.nonzero(A > -np.inf)[0]}
    assert set(got) == set(expected)
    for key, score in expected.items():
        assert np.float32(score) == np.float32(got[key])


def test_accumulate_ghosts_and_group_max():
    rng = np.random.default_rng(3)
    S, k = 12, 3
    eps = log_threshold_for(1.5, 4, k)
    # two groups x two ghosts
    P_all = np.stack([random_log_matrix(rng, S, 4) for _ in range(4)])
    prefix_all = best_score_prefix(P_all)
    A_ghost = np.asarray(accumulate_ghosts(P_all, prefix_all, eps, k=k, sigma=4))
    assert A_ghost.shape == (4, 64)
    for g in range(4):
        solo = np.asarray(accumulate_matrix(P_all[g], prefix_all[g], eps,
                                            k=k, sigma=4))
        np.testing.assert_array_equal(A_ghost[g], solo)
    A_group = np.asarray(group_max(A_ghost, 2))
    assert A_group.shape == (2, 64)
    np.testing.assert_array_equal(A_group[0], np.maximum(A_ghost[0], A_ghost[1]))


def test_tiny_matrix_fewer_windows_than_block():
    rng = np.random.default_rng(1)
    P = random_log_matrix(rng, 5, 4)  # W = 2 for k=4
    prefix = best_score_prefix(P)
    eps = log_threshold_for(1.5, 4, 4)
    A = np.asarray(accumulate_matrix(P, prefix, eps, k=4, sigma=4, block_w=32))
    expected = dcla_matrix_max(P, 4, eps, bits=2)
    got = {int(i): A[i] for i in np.nonzero(A > -np.inf)[0]}
    assert set(got) == set(expected)


def test_width_smaller_than_k_yields_empty():
    P = np.zeros((3, 4), dtype=np.float32)
    prefix = best_score_prefix(P)
    A = np.asarray(accumulate_matrix(P, prefix, np.float32(-1.0), k=5, sigma=4))
    assert (A == -np.inf).all()


def test_high_omega_prunes_everything():
    # threshold >= 1 (log >= 0): no candidate can survive since probs <= 1
    rng = np.random.default_rng(9)
    P = random_log_matrix(rng, 10, 4)
    prefix = best_score_prefix(P)
    eps = log_threshold_for(8.0, 4, 3)  # (8/4)^3 = 8 -> log10 ~ 0.9
    A = np.asarray(accumulate_matrix(P, prefix, eps, k=3, sigma=4))
    assert (A == -np.inf).all()
