"""The production TPU staircase kernel under test (VERDICT r3 items 3/5).

Two layers of evidence, both in Pallas interpret mode on CPU (the driver's
``kernel_parity`` suite row re-checks the same contracts on real hardware):

* direct: ``staircase_select_wide`` (in-kernel two-key sorts + staircase
  extraction) against a brute-force numpy reference over the sorted views —
  values, slot order, totals, overflow;
* end-to-end: the full sparse enumeration with ``use_kernel=True`` must be
  bit-identical (arrays, not sets) to the XLA fallback path that production
  CPU builds run — the contract ``sparse._combine`` relies on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ipk_tpu.core import dense
from ipk_tpu.core import sparse as sparse_mod
from ipk_tpu.core.pallas_kernels import staircase_select_wide


def brute_force_sorted(sL, cL, sR, cR, eps, cap, sort_l=True):
    """Reference: two-key sort (score desc, unsigned code asc) — R always,
    L only with ``sort_l`` — emit surviving pairs row-major, pad with
    (-inf, 0)."""
    G, W, CL = sL.shape
    clu = np.zeros((G, W, cap), np.uint32)
    cru = np.zeros((G, W, cap), np.uint32)
    s_out = np.full((G, W, cap), -np.inf, np.float32)
    tot = np.zeros((G, W), np.int32)
    for g in range(G):
        for w in range(W):
            ol = (np.lexsort((cL[g, w], -sL[g, w])) if sort_l
                  else np.arange(CL))
            orr = np.lexsort((cR[g, w], -sR[g, w]))
            T = sL[g, w][ol][:, None] + sR[g, w][orr][None, :]
            ii, jj = np.nonzero(T > eps[g, w])
            n = len(ii)
            take = min(n, cap)
            tot[g, w] = n
            s_out[g, w, :take] = T[ii[:take], jj[:take]]
            clu[g, w, :take] = cL[g, w, ol][ii[:take]]
            cru[g, w, :take] = cR[g, w, orr][jj[:take]]
    return clu, cru, s_out, tot


@pytest.mark.parametrize("sort_l", [True, False])
@pytest.mark.parametrize("G,W,CL,CR,cap", [
    (1, 5, 20, 33, 128),      # tiny, unaligned widths
    (2, 9, 130, 200, 256),    # multi-tile L, cap < survivors possible
    (1, 3, 300, 40, 384),     # wide L, narrow R
])
def test_wide_kernel_matches_brute_force(G, W, CL, CR, cap, sort_l):
    rng = np.random.default_rng(G * 100 + CL)
    sL = rng.uniform(-6, 0, (G, W, CL)).astype(np.float32)
    sR = rng.uniform(-6, 0, (G, W, CR)).astype(np.float32)
    # duplicate some scores to exercise the code tiebreak
    sL[:, :, ::3] = np.round(sL[:, :, ::3], 1)
    sR[:, :, ::2] = np.round(sR[:, :, ::2], 1)
    cL = rng.permutation(CL * W * G).astype(np.uint32).reshape(G, W, CL)
    cR = rng.permutation(CR * W * G).astype(np.uint32).reshape(G, W, CR)
    eps = rng.uniform(-4.5, -4.0, (G, W)).astype(np.float32)
    got = staircase_select_wide(
        jnp.asarray(sL), jnp.asarray(cL), jnp.asarray(sR), jnp.asarray(cR),
        jnp.asarray(eps), cap=cap, sort_l=sort_l, interpret=True)
    ref = brute_force_sorted(sL, cL, sR, cR, eps, cap, sort_l=sort_l)
    for name, a, b in zip(("cl", "cr", "scores", "totals"),
                          map(np.asarray, got), ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_wide_kernel_unsigned_code_order():
    """Codes with the sign bit set (DNA k=31 half-windows) must sort in
    UNSIGNED order — the biased compare inside the kernel."""
    G, W, CL, CR, cap = 1, 2, 8, 8, 128
    rng = np.random.default_rng(0)
    sL = np.zeros((G, W, CL), np.float32)      # all-tied scores: order is
    sR = np.zeros((G, W, CR), np.float32)      # decided by the codes alone
    cL = (rng.permutation(CL).astype(np.uint32) * np.uint32(0x20000001)
          ).reshape(G, W // 2 if False else 1, CL).repeat(W, axis=1)
    cR = (rng.permutation(CR).astype(np.uint32) * np.uint32(0x30000001)
          ).reshape(G, 1, CR).repeat(W, axis=1)
    eps = np.full((G, W), -1.0, np.float32)
    got = staircase_select_wide(
        jnp.asarray(sL), jnp.asarray(cL), jnp.asarray(sR), jnp.asarray(cR),
        jnp.asarray(eps), cap=cap, interpret=True)
    ref = brute_force_sorted(sL, cL, sR, cR, eps, cap)
    for name, a, b in zip(("cl", "cr", "scores", "totals"),
                          map(np.asarray, got), ref):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_wide_kernel_overflow_totals():
    """totals must report the TRUE survivor count even past cap."""
    G, W, CL, CR, cap = 1, 4, 40, 40, 128
    rng = np.random.default_rng(3)
    sL = rng.uniform(-1, 0, (G, W, CL)).astype(np.float32)
    sR = rng.uniform(-1, 0, (G, W, CR)).astype(np.float32)
    cL = np.arange(G * W * CL, dtype=np.uint32).reshape(G, W, CL)
    cR = np.arange(G * W * CR, dtype=np.uint32).reshape(G, W, CR)
    eps = np.full((G, W), -100.0, np.float32)   # everything survives
    _, _, s, tot = map(np.asarray, staircase_select_wide(
        jnp.asarray(sL), jnp.asarray(cL), jnp.asarray(sR), jnp.asarray(cR),
        jnp.asarray(eps), cap=cap, interpret=True))
    assert (tot == CL * CR).all()
    assert np.isfinite(s).all()                  # cap slots all filled


@pytest.mark.parametrize("k,sigma,bits,cap,omega", [
    (6, 4, 2, 512, 1.5),
    (6, 20, 5, 1024, 4.0),
])
def test_sparse_path_kernel_bitequal_fallback(k, sigma, bits, cap, omega):
    """enumerate_sparse_many(use_kernel=True) — the production TPU route —
    must equal the XLA fallback bit-for-bit: same arrays, same slot order
    (both emit over the identical two-key sorted views)."""
    rng = np.random.default_rng(k + sigma)
    G, S = 2, 22
    p = rng.dirichlet(np.ones(sigma) * 0.4, size=(G, S)).astype(np.float32)
    P = np.log10(np.maximum(p, 1e-30)).astype(np.float32)
    prefix = dense.best_score_prefix(P)
    eps = np.float32(np.log10((omega / sigma) ** k))
    c0, s0, o0 = sparse_mod.enumerate_sparse_many(
        P, prefix, eps, k=k, sigma=sigma, bits=bits, cap=cap,
        use_kernel=False)
    c1, s1, o1 = sparse_mod.enumerate_sparse_many(
        P, prefix, eps, k=k, sigma=sigma, bits=bits, cap=cap,
        use_kernel=True)
    assert int(np.isfinite(s0).sum()) > 0        # non-vacuous workload
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(s0, s1)
    np.testing.assert_array_equal(o0, o1)


def test_wide_kernel_presorted_route():
    """sort_r=False (the VMEM-relief route for oversize children): inputs
    pre-sorted in XLA, kernel sorts nothing — output must be identical to
    the in-kernel-sort call."""
    rng = np.random.default_rng(9)
    G, W, CL, CR, cap = 1, 6, 100, 150, 256
    sL = rng.uniform(-6, 0, (G, W, CL)).astype(np.float32)
    sR = rng.uniform(-6, 0, (G, W, CR)).astype(np.float32)
    cL = rng.permutation(CL * W).astype(np.uint32).reshape(G, W, CL)
    cR = rng.permutation(CR * W).astype(np.uint32).reshape(G, W, CR)
    eps = rng.uniform(-4.2, -4.0, (G, W)).astype(np.float32)
    ref = staircase_select_wide(
        jnp.asarray(sL), jnp.asarray(cL), jnp.asarray(sR), jnp.asarray(cR),
        jnp.asarray(eps), cap=cap, sort_l=True, interpret=True)
    cLs, sLs = sparse_mod._sort_desc(jnp.asarray(cL), jnp.asarray(sL))
    cRs, sRs = sparse_mod._sort_desc(jnp.asarray(cR), jnp.asarray(sR))
    got = staircase_select_wide(
        sLs, cLs, sRs, cRs, jnp.asarray(eps), cap=cap,
        sort_l=False, sort_r=False, interpret=True)
    for name, a, b in zip(("cl", "cr", "scores", "totals"),
                          map(np.asarray, got), map(np.asarray, ref)):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_wide_kernel_compact_r_half_sort():
    """compact_r: prefix-packed R lists may take the half-width sort
    network — output must equal the full-sort call on both branches
    (alive <= half and alive > half blocks)."""
    rng = np.random.default_rng(21)
    G, W, CL, CR, cap = 1, 6, 40, 300, 256   # CRp = 512 >= 256
    sL = rng.uniform(-6, 0, (G, W, CL)).astype(np.float32)
    sR = np.full((G, W, CR), -np.inf, np.float32)
    cR = np.zeros((G, W, CR), np.uint32)
    for w in range(W):
        # vary live prefix length: some windows far below CRp/2, one above
        n = 250 if w == 3 else 40 + 10 * w
        sR[0, w, :n] = rng.uniform(-6, 0, n).astype(np.float32)
        cR[0, w, :n] = rng.permutation(1000)[:n].astype(np.uint32) + 1
    cL = rng.permutation(CL * W).astype(np.uint32).reshape(G, W, CL)
    eps = rng.uniform(-4.4, -4.2, (G, W)).astype(np.float32)
    args = (jnp.asarray(sL), jnp.asarray(cL), jnp.asarray(sR),
            jnp.asarray(cR), jnp.asarray(eps))
    ref = staircase_select_wide(*args, cap=cap, sort_l=False,
                                interpret=True)
    got = staircase_select_wide(*args, cap=cap, sort_l=False,
                                compact_r=True, interpret=True)
    for name, a, b in zip(("cl", "cr", "scores", "totals"),
                          map(np.asarray, got), map(np.asarray, ref)):
        np.testing.assert_array_equal(a, b, err_msg=name)
