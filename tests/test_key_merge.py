"""Device-resident cross-shard key merge (parallel/key_merge.py).

The device pipeline (sort → segment-max → all-to-all by key range → final
sort) must reproduce the host merge exactly: per-(key, group) max scores in
a (key, group)-ascending stream. ``test_sharded_build_sparse_equal``
(test_builder_modes.py) covers it end-to-end through ``build``; here the
primitive is checked directly against a numpy reference, including the
overflow contract.
"""

import numpy as np
import pytest

import jax

from ipk_tpu.core.sparse import merge_window_lists
from ipk_tpu.parallel.key_merge import KeyMergeOverflow, device_key_merge
from ipk_tpu.parallel.mesh import make_mesh


def _host_reference(cl, cr, scores, gpg, bits, k):
    shift = np.uint64(bits * (k - k // 2))
    codes = ((cl.astype(np.uint64) << shift) | cr.astype(np.uint64))
    keys, borders, scs = [], [], []
    for g0 in range(0, cl.shape[0], gpg):
        c, s = merge_window_lists(codes[g0:g0 + gpg], scores[g0:g0 + gpg])
        keys.append(c)
        scs.append(s)
        borders.append(np.full(len(c), g0 // gpg, dtype=np.int64))
    keys = np.concatenate(keys)
    borders = np.concatenate(borders)
    scs = np.concatenate(scs)
    order = np.lexsort((borders, keys))
    return keys[order], borders[order], scs[order]


def _random_lists(rng, G, W, C, nl, nr):
    cl = rng.integers(0, nl, (G, W, C)).astype(np.uint32)
    cr = rng.integers(0, nr, (G, W, C)).astype(np.uint32)
    scores = rng.uniform(-9, 0, (G, W, C)).astype(np.float32)
    # knock out ~30% of slots (empty survivor positions)
    scores[rng.random((G, W, C)) < 0.3] = -np.inf
    return cl, cr, scores


@pytest.mark.parametrize("gpg", [1, 2])
def test_device_merge_matches_host(gpg):
    n_dev = jax.device_count()
    mesh = make_mesh(n_branch=n_dev, n_key=1)
    rng = np.random.default_rng(11)
    k, bits = 8, 2
    nl, nr = 4 ** (k // 2), 4 ** (k - k // 2)
    G = n_dev * gpg * 2            # 2 groups per device
    cl, cr, scores = _random_lists(rng, G, 6, 128, nl, nr)
    keys, border, scs = device_key_merge(
        mesh, cl, cr, scores, ghosts_per_group=gpg, nl=nl, bits=bits, k=k)
    rk, rb, rs = _host_reference(cl, cr, scores, gpg, bits, k)
    np.testing.assert_array_equal(keys, rk)
    np.testing.assert_array_equal(border, rb)
    np.testing.assert_array_equal(scs, rs)


def test_device_merge_duplicate_max_and_empty_device():
    """Duplicate (key, group) pairs keep the max score; devices whose key
    range is empty produce nothing."""
    n_dev = jax.device_count()
    mesh = make_mesh(n_branch=n_dev, n_key=1)
    k, bits = 4, 2
    nl, nr = 4, 64
    G, W, C = n_dev, 3, 8
    cl = np.zeros((G, W, C), np.uint32)          # all keys in range 0
    cr = np.tile(np.arange(C, dtype=np.uint32) % 4, (G, W, 1))
    scores = np.tile(
        np.linspace(-5, -1, C).astype(np.float32), (G, W, 1))
    keys, border, scs = device_key_merge(
        mesh, cl, cr, scores, ghosts_per_group=1, nl=nl, bits=bits, k=k)
    rk, rb, rs = _host_reference(cl, cr, scores, 1, bits, k)
    np.testing.assert_array_equal(keys, rk)
    np.testing.assert_array_equal(border, rb)
    np.testing.assert_array_equal(scs, rs)


def test_device_merge_overflow_raises():
    n_dev = jax.device_count()
    mesh = make_mesh(n_branch=n_dev, n_key=1)
    rng = np.random.default_rng(3)
    k, bits = 8, 2
    nl, nr = 4 ** 4, 4 ** 4
    G = n_dev
    cl, cr, scores = _random_lists(rng, G, 8, 256, nl, nr)
    cl[:] = 0                       # every tuple lands in bucket 0
    with pytest.raises(KeyMergeOverflow):
        device_key_merge(mesh, cl, cr, scores, ghosts_per_group=1, nl=nl,
                         bits=bits, k=k, bucket_cap=128)


def test_device_merge_amino_bitpacked_codes():
    """σ=20 regression (r5): cl codes are BIT-packed (5 bits/symbol), so
    codes above σ^hl exist; binning by σ^hl dropped them from every bucket.
    The binning space must be 2^(bits·hl)."""
    n_dev = jax.device_count()
    mesh = make_mesh(n_branch=n_dev, n_key=1)
    rng = np.random.default_rng(23)
    k, bits, sigma = 4, 5, 20
    hl = k // 2
    G, W, C = n_dev * 2, 5, 64
    # genuine AA packed codes: letters < 20 per symbol, 5-bit strides —
    # includes codes >= sigma**hl (e.g. 19<<5 | 0 = 608 > 400)
    def pack(rng, shape):
        a = rng.integers(0, sigma, shape).astype(np.uint32)
        b = rng.integers(0, sigma, shape).astype(np.uint32)
        return (a << np.uint32(bits)) | b
    cl = pack(rng, (G, W, C))
    cr = pack(rng, (G, W, C))
    scores = rng.uniform(-9, 0, (G, W, C)).astype(np.float32)
    scores[rng.random((G, W, C)) < 0.3] = -np.inf
    assert (cl >= sigma ** hl).any()          # the regression trigger
    keys, border, scs = device_key_merge(
        mesh, cl, cr, scores, ghosts_per_group=2,
        nl=1 << (bits * hl), bits=bits, k=k)
    rk, rb, rs = _host_reference(cl, cr, scores, 2, bits, k)
    np.testing.assert_array_equal(keys, rk)
    np.testing.assert_array_equal(border, rb)
    np.testing.assert_array_equal(scs, rs)
