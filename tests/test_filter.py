"""Native (threaded C++) vs numpy mif0 filter agreement.

The production filter (``native/mif0_filter.cpp``) replicates
``mif0_filter_values_entries``'s math (= the reference's
``filter.cpp:60-119``) with the same per-key accumulation order; numpy's
SIMD pow/log2 differ from libm by up to 1 ulp per call, so the test bounds
the aggregate error at a few ulp instead of asserting bit-equality.
"""

import os

import numpy as np
import pytest

from ipk_tpu.core import filter as filt


def _both_paths(scores, key_index, num_keys, N, thr):
    lib = filt._load_native()
    if lib is None:
        pytest.skip("native filter library unavailable (no toolchain)")
    fv_native = filt.mif0_filter_values_entries(scores, key_index, num_keys,
                                                N, thr)
    os.environ["IPK_TPU_NO_NATIVE"] = "1"
    try:
        fv_numpy = filt.mif0_filter_values_entries(scores, key_index,
                                                   num_keys, N, thr)
    finally:
        del os.environ["IPK_TPU_NO_NATIVE"]
    return fv_native, fv_numpy


def test_native_filter_matches_numpy_within_ulps():
    rng = np.random.default_rng(3)
    E, K = 200_000, 5_000
    key_index = np.sort(rng.integers(0, K, E)).astype(np.int64)
    scores = rng.uniform(-8.0, 0.0, E).astype(np.float32)
    thr = filt.score_threshold(1.5, 4, 8)
    fv_nat, fv_np = _both_paths(scores, key_index, K, 127, thr)
    counts = np.bincount(key_index, minlength=K)
    present = counts > 0
    a, b = fv_nat[present], fv_np[present]
    # each entry contributes up to ~2 ulp (pow + log2 last-bit differences),
    # so the per-key bound scales with its entry count
    bound = (2 * counts[present] + 8) * np.spacing(
        np.maximum(np.abs(a), np.abs(b)))
    assert np.all(np.abs(a - b) <= bound), (
        "native filter drifted beyond per-entry ulp noise")
    # and the f32 column actually serialized is (near-)identical
    assert (a.astype(np.float32) != b.astype(np.float32)).mean() < 1e-4


def test_native_filter_used_only_for_sorted_indices():
    # shuffled (non-monotone) key indices must route to the numpy path and
    # still produce correct values
    rng = np.random.default_rng(4)
    E, K = 10_000, 400
    key_index = rng.integers(0, K, E).astype(np.int64)
    scores = rng.uniform(-6.0, 0.0, E).astype(np.float32)
    thr = filt.score_threshold(2.0, 4, 6)
    fv = filt.mif0_filter_values_entries(scores, key_index, K, 63, thr)
    os.environ["IPK_TPU_NO_NATIVE"] = "1"
    try:
        fv_ref = filt.mif0_filter_values_entries(scores, key_index, K, 63,
                                                 thr)
    finally:
        del os.environ["IPK_TPU_NO_NATIVE"]
    present = np.bincount(key_index, minlength=K) > 0
    assert np.array_equal(fv[present], fv_ref[present])


def test_native_filter_single_key_and_empty():
    lib = filt._load_native()
    if lib is None:
        pytest.skip("native filter library not built")
    thr = filt.score_threshold(1.5, 4, 8)
    fv = filt.mif0_filter_values_entries(
        np.float32([-1.0, -2.0]), np.int64([0, 0]), 1, 10, thr)
    fv_np = filt.mif0_filter_values(
        np.float32([[-1.0], [-2.0]]), np.ones((2, 1), bool), 10, thr)
    assert np.allclose(fv, fv_np, rtol=1e-12)
