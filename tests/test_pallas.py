"""Fused Pallas kernel vs the jnp dense path (interpret mode on CPU)."""

import numpy as np
import pytest

from ipk_tpu.core import dense
from ipk_tpu.core.pallas_kernels import accumulate_ghosts_fused, combine_max


def make_inputs(rng, G, S, sigma=4):
    p = rng.dirichlet(np.ones(sigma) * 0.4, size=(G, S)).astype(np.float32)
    P = np.log10(np.maximum(p, 1e-30)).astype(np.float32)
    return P, dense.best_score_prefix(P)


def eps_for(omega, sigma, k):
    return np.float32(np.log10((omega / sigma) ** k))


def test_masked_halves_reconstruct_window_block():
    """L ⊕ R with the constant top threshold == score_window_block."""
    rng = np.random.default_rng(0)
    k, sigma, S = 6, 4, 24
    P, prefix = make_inputs(rng, 1, S)
    P, prefix = P[0], prefix[0]
    eps = eps_for(1.5, sigma, k)
    W = S - k + 1
    L, R = dense.masked_halves(P, prefix, eps, k=k, sigma=sigma)
    L, R = np.asarray(L), np.asarray(R)
    T_ref = np.asarray(dense.score_window_block(
        P, prefix, 0, k=k, sigma=sigma, log_threshold=eps, block_w=W))
    T = (L[:, :, None] + R[:, None, :]).reshape(W, -1)
    T = np.where(T > eps, T, -np.inf)
    np.testing.assert_array_equal(T, T_ref)


@pytest.mark.parametrize("k,block_w", [(4, 4), (6, 8), (7, 16), (8, 64)])
def test_fused_matches_jnp_path(k, block_w):
    rng = np.random.default_rng(k)
    sigma, G, S = 4, 6, 20
    P_all, prefix_all = make_inputs(rng, G, S)
    eps = eps_for(1.5, sigma, k)
    A_ref = np.asarray(dense.accumulate_ghosts(P_all, prefix_all, eps,
                                               k=k, sigma=sigma))
    A = np.asarray(accumulate_ghosts_fused(P_all, prefix_all, eps, k=k,
                                           sigma=sigma, block_w=block_w,
                                           interpret=True))
    np.testing.assert_array_equal(A, A_ref)


def test_fused_counts_match():
    rng = np.random.default_rng(42)
    k, sigma, G, S = 5, 4, 4, 18
    P_all, prefix_all = make_inputs(rng, G, S)
    eps = eps_for(1.5, sigma, k)
    _, counts_ref = dense.accumulate_ghosts(P_all, prefix_all, eps, k=k,
                                            sigma=sigma, with_count=True)
    A, counts = accumulate_ghosts_fused(P_all, prefix_all, eps, k=k,
                                        sigma=sigma, block_w=8,
                                        with_count=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(counts, dtype=np.int64),
                                  np.asarray(counts_ref, dtype=np.int64))


def test_fused_aa_alphabet():
    rng = np.random.default_rng(3)
    k, sigma, G, S = 3, 20, 2, 12
    P_all, prefix_all = make_inputs(rng, G, S, sigma)
    eps = eps_for(4.0, sigma, k)
    A_ref = np.asarray(dense.accumulate_ghosts(P_all, prefix_all, eps,
                                               k=k, sigma=sigma))
    A = np.asarray(accumulate_ghosts_fused(P_all, prefix_all, eps, k=k,
                                           sigma=sigma, interpret=True))
    np.testing.assert_array_equal(A, A_ref)


def test_combine_max_window_padding():
    """W not divisible by block_w: padded windows must not contribute."""
    rng = np.random.default_rng(9)
    G, W, nl, nr = 2, 5, 16, 16
    L = rng.normal(size=(G, W, nl)).astype(np.float32)
    R = rng.normal(size=(G, W, nr)).astype(np.float32)
    eps = np.float32(-100.0)
    A = np.asarray(combine_max(L, R, eps, block_w=4, interpret=True))
    expected = (L[:, :, :, None] + R[:, :, None, :]).max(axis=1)
    np.testing.assert_array_equal(A, expected)


def test_combine_max_nr_blocking():
    """Candidate-pair spaces above the 1 MB VMEM tile budget are gridded
    over the nr axis; results and counts must match the un-gridded path
    (here forced small via a sliced L against a wide R, as the key-batched
    k=12 build produces)."""
    import jax.numpy as jnp
    from ipk_tpu.core.dense import combine_max_jnp

    rng = np.random.default_rng(3)
    k, sigma, G, S = 10, 4, 2, 24
    P_all, prefix_all = make_inputs(rng, G, S)
    eps = eps_for(1.2, sigma, k)
    L, R = [], []
    for g in range(G):
        Lg, Rg = dense.masked_halves(P_all[g], prefix_all[g], eps,
                                     k=k, sigma=sigma)
        L.append(np.asarray(Lg))
        R.append(np.asarray(Rg))
    L, R = jnp.asarray(np.stack(L)), jnp.asarray(np.stack(R))
    # nl * nr * 4 = 1024 * 1024 * 4 = 4 MB > 1 MB budget -> nr gridding
    A_ref = np.asarray(combine_max_jnp(L, R, eps))
    A, counts = combine_max(L, R, eps, block_w=8, with_count=True,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(A), A_ref)
    count_ref = int((np.asarray(L)[:, :, :, None] + np.asarray(R)[:, :, None, :]
                     > eps).sum())
    assert int(np.asarray(counts).astype(np.int64).sum()) == count_ref


@pytest.mark.parametrize("block_w", [8, 16])
def test_split_accumulator_bitequal(block_w):
    """IPK_TPU_SPLIT_ACC (even/odd window accumulator halves — an ILP
    experiment, measured slower on chip and default-off) must stay
    bit-identical in values AND counts."""
    import functools
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(17)
    k, sigma = 6, 4
    P, prefix = make_inputs(rng, 3, 37 + k - 1, sigma)
    eps = eps_for(1.5, sigma, k)
    halves = jax.vmap(
        functools.partial(dense.masked_halves, k=k, sigma=sigma),
        in_axes=(0, 0, None))
    L, R = halves(jnp.asarray(P), jnp.asarray(prefix), eps)
    A0, c0 = combine_max(L, R, eps, block_w=block_w, with_count=True,
                         interpret=True, split_acc=False)
    A1, c1 = combine_max(L, R, eps, block_w=block_w, with_count=True,
                         interpret=True, split_acc=True)
    np.testing.assert_array_equal(np.asarray(A0), np.asarray(A1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    B0 = combine_max(L, R, eps, block_w=block_w, interpret=True,
                     split_acc=False)
    B1 = combine_max(L, R, eps, block_w=block_w, interpret=True,
                     split_acc=True)
    np.testing.assert_array_equal(np.asarray(B0), np.asarray(B1))
