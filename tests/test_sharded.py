"""Multi-device sharded build tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax

from ipk_tpu.core import dense
from ipk_tpu.core.filter import mif0_filter_values, score_threshold
from ipk_tpu.parallel.mesh import make_mesh
from ipk_tpu.parallel.build_sharded import (pad_ghosts, sharded_build_step,
                                            PAD_LOG_SCORE)


def make_inputs(rng, G, S, sigma=4):
    p = rng.dirichlet(np.ones(sigma) * 0.4, size=(G, S)).astype(np.float32)
    P = np.log10(np.maximum(p, 1e-30)).astype(np.float32)
    return P, dense.best_score_prefix(P)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)


def test_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    k, sigma = 4, 4
    G, S = 16, 20  # 8 groups x 2 ghosts over 4 devices
    P_all, prefix_all = make_inputs(rng, G, S)
    eps = np.float32(np.log10(score_threshold(1.5, sigma, k)))

    mesh = make_mesh(n_branch=4, n_key=1, devices=jax.devices()[:4])
    step = sharded_build_step(mesh, k=k, sigma=sigma, ghosts_per_group=2,
                              total_num_groups=9,
                              threshold=score_threshold(1.5, sigma, k))
    A_sharded, fv_sharded, counts = step(P_all, prefix_all, eps)
    A_sharded = np.asarray(A_sharded)

    # single-device reference
    A_ghost = dense.accumulate_ghosts(P_all, prefix_all, eps, k=k, sigma=sigma)
    A_single = np.asarray(dense.group_max(A_ghost, 2))
    np.testing.assert_array_equal(A_sharded, A_single)

    # distributed f32 MI vs host f64 MI: close (not bit-equal by design)
    mask = np.isfinite(A_single)
    fv_host = mif0_filter_values(A_single, mask, 9,
                                 score_threshold(1.5, sigma, k))
    present = mask.any(axis=0)
    np.testing.assert_allclose(np.asarray(fv_sharded)[present],
                               fv_host[present], rtol=2e-4, atol=1e-6)


def test_padding_produces_no_survivors():
    rng = np.random.default_rng(1)
    P_all, prefix_all = make_inputs(rng, 6, 15)
    P_pad, prefix_pad, G = pad_ghosts(P_all, prefix_all, multiple=8)
    assert P_pad.shape[0] == 8 and G == 6
    assert (P_pad[6:] == PAD_LOG_SCORE).all()
    eps = np.float32(np.log10(score_threshold(1.5, 4, 3)))
    A = np.asarray(dense.accumulate_ghosts(P_pad, prefix_pad, eps, k=3, sigma=4))
    assert np.isfinite(A[:6]).any()
    assert not np.isfinite(A[6:]).any()  # padded ghosts fully pruned


@pytest.mark.parametrize("n_branch", [1, 2, 8])
def test_sharded_various_mesh_sizes(n_branch):
    rng = np.random.default_rng(2)
    k, sigma = 3, 4
    G, S = 2 * n_branch * 2, 12
    P_all, prefix_all = make_inputs(rng, G, S)
    eps = np.float32(np.log10(score_threshold(1.0, sigma, k)))
    mesh = make_mesh(n_branch=n_branch, n_key=1,
                     devices=jax.devices()[:n_branch])
    step = sharded_build_step(mesh, k=k, sigma=sigma, ghosts_per_group=2,
                              total_num_groups=G // 2 + 1,
                              threshold=score_threshold(1.0, sigma, k))
    A, fv, _ = step(P_all, prefix_all, eps)
    A_ghost = dense.accumulate_ghosts(P_all, prefix_all, eps, k=k, sigma=sigma)
    expected = np.asarray(dense.group_max(A_ghost, 2))
    np.testing.assert_array_equal(np.asarray(A), expected)


def test_2d_mesh_branch_key():
    """2D mesh: branch-DP enumeration + key-sharded filter tail."""
    rng = np.random.default_rng(5)
    k, sigma = 4, 4
    G, S = 16, 18
    P_all, prefix_all = make_inputs(rng, G, S)
    eps = np.float32(np.log10(score_threshold(1.5, sigma, k)))
    mesh = make_mesh(n_branch=4, n_key=2)
    step = sharded_build_step(mesh, k=k, sigma=sigma, ghosts_per_group=2,
                              total_num_groups=9,
                              threshold=score_threshold(1.5, sigma, k))
    A, fv, _ = step(P_all, prefix_all, eps)
    assert np.asarray(fv).shape == (sigma ** k,)
    A_ghost = dense.accumulate_ghosts(P_all, prefix_all, eps, k=k, sigma=sigma)
    expected = np.asarray(dense.group_max(A_ghost, 2))
    np.testing.assert_array_equal(np.asarray(A), expected)
    mask = np.isfinite(expected)
    fv_host = mif0_filter_values(expected, mask, 9,
                                 score_threshold(1.5, sigma, k))
    present = mask.any(axis=0)
    np.testing.assert_allclose(np.asarray(fv)[present], fv_host[present],
                               rtol=2e-4, atol=1e-6)
