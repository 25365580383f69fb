"""Fused Pallas TPU kernels for the dense enumeration hot path.

The enumeration factorizes (see ``dense.masked_halves``) into cheap masked
half-window tensors L[W, nl], R[W, nr] plus one expensive combine:

    A = max over windows w of  where(L[w] ⊕ R[w] > eps, L[w] ⊕ R[w], -inf)

where ⊕ is the broadcasted outer sum ([nl, 1] + [1, nr]). The jnp/XLA version
materializes the [block_w, nl*nr] score tensor in HBM every block; this kernel
keeps everything in VMEM: per grid step it streams a block of windows, forms
each [nl, nr] score tile in registers/VMEM, and folds it into the VMEM-resident
accumulator. HBM traffic collapses to reading L/R once and writing A once —
the kernel is VPU-bound (4 ops per candidate), which is the speed-of-light
regime for this op (no matmul structure: the combine is an outer *sum*, so
the MXU does not apply).

Grid: (G, W_blocks) with the W axis innermost so the A block for ghost g is
revisited sequentially (standard accumulate pattern).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense import NEG_INF, masked_halves, group_max

__all__ = ["combine_max", "accumulate_ghosts_fused", "staircase_select",
           "staircase_select_batched", "staircase_select_wide",
           "sort_pairs_desc", "INTERPRET"]

#: Interpreter mode for CPU testing (set IPK_TPU_INTERPRET=1; tests do).
INTERPRET = os.environ.get("IPK_TPU_INTERPRET", "0") == "1"


def _combine_kernel(L_ref, R_ref, eps_ref, A_ref, *, block_w: int,
                    num_blocks: int, t_chunk: int, with_count: bool,
                    count_ref=None, cacc_ref=None):
    nrb = pl.program_id(1)
    wb = pl.program_id(2)
    nl = A_ref.shape[1]

    @pl.when(wb == 0)
    def _():
        A_ref[:] = jnp.full_like(A_ref, NEG_INF)
        if with_count:
            cacc_ref[:] = jnp.zeros_like(cacc_ref)
            @pl.when(nrb == 0)
            def _():
                count_ref[:] = jnp.zeros_like(count_ref)

    # Two layout tricks keep the VPU fed (each measured ~1.7-2x on its own):
    #
    # 1. The outer sum needs L[w] as a SUBLANE vector, but rows of the VMEM
    #    block are LANE vectors; the naive per-window `L[i][:, None]` is a
    #    lane->sublane relayout costing ~3/4 of kernel time. Instead,
    #    transpose t_chunk windows at once ([t_chunk, nl] -> [nl, t_chunk])
    #    and peel columns with *static* lane slices (unrolled inner loop;
    #    dynamic lane indexing is not lowerable on TPU).
    #
    # 2. Masking (x -> x if x > eps else -inf) is monotone, so it commutes
    #    with max over windows: accumulate raw maxes and mask once at the
    #    last block — one fewer vselect per candidate in the hot loop. The
    #    tuple count, which does need the per-window comparison, accumulates
    #    ELEMENTWISE into an int32 VMEM scratch tile (a vector add, vs. a
    #    64-vreg tree reduction per window) and is reduced once per ghost.
    def body(t, _):
        Lc = L_ref[0, pl.ds(t * t_chunk, t_chunk), :]
        LT = jnp.transpose(Lc)                    # [nl, t_chunk]
        Rc = R_ref[0, pl.ds(t * t_chunk, t_chunk), :]
        A = A_ref[0]
        cacc = cacc_ref[0] if with_count else None
        for j in range(t_chunk):
            T = jax.lax.slice(LT, (0, j), (nl, j + 1)) + Rc[j][None, :]
            A = jnp.maximum(A, T)
            if with_count:
                cacc = cacc + (T > eps_ref[0, 0]).astype(jnp.int32)
        A_ref[0] = A
        if with_count:
            cacc_ref[0] = cacc
        return 0

    def body_1w(i, _):
        # fallback for window blocks narrower than a sublane tile
        T = L_ref[0, i][:, None] + R_ref[0, i][None, :]
        A_ref[0] = jnp.maximum(A_ref[0], T)
        if with_count:
            cacc_ref[0] = cacc_ref[0] + (T > eps_ref[0, 0]).astype(jnp.int32)
        return 0

    if t_chunk > 1:
        jax.lax.fori_loop(0, block_w // t_chunk, body, 0)
    else:
        jax.lax.fori_loop(0, block_w, body_1w, 0)

    @pl.when(wb == num_blocks - 1)
    def _():
        A = A_ref[0]
        A_ref[0] = jnp.where(A > eps_ref[0, 0], A, NEG_INF)
        if with_count:
            # the count output is a VMEM-tiled (1, 8, 128) slab (SMEM outputs
            # cannot be blocked per grid cell, and scalar stores to VMEM are
            # not allowed): broadcast-accumulate the reduced per-nr-block
            # total over the tile (zeroed at nrb == 0, wb == 0 above)
            count_ref[0] = count_ref[0] + jnp.sum(cacc_ref[0])


@functools.partial(jax.jit,
                   static_argnames=("block_w", "with_count", "interpret"))
def combine_max(L: jnp.ndarray, R: jnp.ndarray, log_threshold, *,
                block_w: int = 256, with_count: bool = False,
                interpret: bool | None = None):
    """A[g] = max_w mask(L[g, w] ⊕ R[g, w]) for all ghosts.

    L: [G, W, nl], R: [G, W, nr] f32 (from ``masked_halves``, -inf = pruned).
    Returns A[G, nl, nr] (+ per-ghost surviving-tuple counts when with_count).
    Window padding (to a multiple of block_w) must be -inf rows.
    """
    if interpret is None:
        interpret = INTERPRET
    G, W, nl = L.shape
    nr = R.shape[2]
    nl0, nr0 = nl, nr
    # pad candidate axes up to multiples of the hardware tile (8 sublanes x
    # 128 lanes): sub-tile or misaligned blocks trigger pathological Mosaic
    # compile times (~84s for [64, 64] vs 0.6s for [64, 256]); -inf candidates
    # are inert under max and never survive the threshold, and the caller
    # slices them away
    nl_pad = -(-nl // 8) * 8
    nr_pad = -(-nr // 128) * 128
    if nl_pad != nl:
        L = jnp.concatenate(
            [L, jnp.full((G, W, nl_pad - nl), NEG_INF, jnp.float32)], axis=2)
    if nr_pad != nr:
        R = jnp.concatenate(
            [R, jnp.full((G, W, nr_pad - nr), NEG_INF, jnp.float32)], axis=2)
    bw = min(block_w, W)
    num_blocks = -(-W // bw)
    pad = num_blocks * bw - W
    if pad:
        fill = jnp.full((G, pad, nl_pad), NEG_INF, dtype=jnp.float32)
        L = jnp.concatenate([L, fill], axis=1)
        R = jnp.concatenate([R, jnp.full((G, pad, nr_pad), NEG_INF,
                                         dtype=jnp.float32)], axis=1)
    # block the candidate-pair axis so the VMEM-resident accumulator tile
    # (plus its int32 count twin and a few live temporaries) stays well under
    # the ~16 MB scoped-VMEM limit: [nl, nr_blk] f32 <= ~1 MB
    tile_budget = 1 << 20
    if nl_pad * nr_pad * 4 <= tile_budget:
        nr_blk = nr_pad
    else:
        nr_blk = max(128, (tile_budget // (nl_pad * 4)) // 128 * 128)
        nr_pad = -(-nr_pad // nr_blk) * nr_blk
        if nr_pad != R.shape[2]:
            R = jnp.concatenate(
                [R, jnp.full((G, R.shape[1], nr_pad - R.shape[2]), NEG_INF,
                             jnp.float32)], axis=2)
    num_nrb = nr_pad // nr_blk
    nl, nr = nl_pad, nr_pad
    eps = jnp.asarray(log_threshold, dtype=jnp.float32).reshape(1, 1)

    # largest power-of-two transpose chunk (<= 64 windows) dividing the block;
    # chunks below a sublane tile (8) gain nothing over the per-window path
    t_chunk = 1
    for cand in (64, 32, 16, 8):
        if bw % cand == 0:
            t_chunk = cand
            break

    out_shape = [jax.ShapeDtypeStruct((G, nl, nr), jnp.float32)]
    out_specs = [pl.BlockSpec((1, nl, nr_blk), lambda g, nrb, wb: (g, 0, nrb),
                              memory_space=pltpu.VMEM)]
    scratch_shapes = []
    if with_count:
        def kernel(L_ref, R_ref, eps_ref, A_ref, count_ref, cacc_ref):
            _combine_kernel(L_ref, R_ref, eps_ref, A_ref, block_w=bw,
                            num_blocks=num_blocks, t_chunk=t_chunk,
                            with_count=True, count_ref=count_ref,
                            cacc_ref=cacc_ref)
        out_shape.append(jax.ShapeDtypeStruct((G, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128),
                                      lambda g, nrb, wb: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch_shapes = [pltpu.VMEM((1, nl, nr_blk), jnp.int32)]
    else:
        kernel = functools.partial(_combine_kernel, block_w=bw,
                                   num_blocks=num_blocks, t_chunk=t_chunk,
                                   with_count=False)

    result = pl.pallas_call(
        kernel,
        grid=(G, num_nrb, num_blocks),
        in_specs=[
            pl.BlockSpec((1, bw, nl), lambda g, nrb, wb: (g, wb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw, nr_blk), lambda g, nrb, wb: (g, wb, nrb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g, nrb, wb: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(L, R, eps)
    A = result[0][:, :nl0, :nr0]
    if with_count:
        return A, result[1][:, 0, 0]
    return A


@functools.partial(jax.jit, static_argnames=("k", "sigma", "block_w",
                                             "with_count", "interpret"))
def accumulate_ghosts_fused(P_all: jnp.ndarray, prefix_all: jnp.ndarray,
                            log_threshold, *, k: int, sigma: int,
                            block_w: int = 256, with_count: bool = False,
                            interpret: bool | None = None):
    """Fused-path equivalent of ``dense.accumulate_ghosts``:
    halves in XLA, combine+accumulate in Pallas. Bit-identical output.

    P_all: [G, S, sigma] → A[G, sigma^k] (+ per-ghost tuple counts).
    """
    halves = jax.vmap(
        functools.partial(masked_halves, k=k, sigma=sigma),
        in_axes=(0, 0, None))
    L, R = halves(P_all, prefix_all, log_threshold)
    out = combine_max(L, R, log_threshold, block_w=block_w,
                      with_count=with_count, interpret=interpret)
    G = P_all.shape[0]
    if with_count:
        A, counts = out
        return A.reshape(G, -1), counts
    return out.reshape(G, -1)


# ---------------------------------------------------------------------------
# staircase combine+select (the sparse large-k path's hot kernel)
# ---------------------------------------------------------------------------
#
# The sparse path (core/sparse.py) needs a capacity-bounded threshold combine
# of two survivor lists per window: emit all pairs with fl(sL[i]+sR[j]) > eps
# compacted into `cap` slots. The TPU formulation is count → offsets →
# membership extraction, all in 128×128 tile arithmetic (no sorts, no
# gathers, no dynamic lane indexing — none of those lower well under Mosaic):
#
#   1. per-row survivor counts: cnt[i] = Σ_j (sL[i]+sR[j] > eps). Because sR
#      is sorted score-descending, row i's survivors are exactly its first
#      cnt[i] columns (f32 addition is monotone) — the staircase.
#   2. exclusive offsets offx = cumsum(cnt), via two triangular matmuls on
#      the MXU (f32 exact: totals < 2^24).
#   3. slot t ∈ [0, cap): its row i is the unique one with
#      offx[i] <= t < offx[i]+cnt[i] (membership mask, one live term → the
#      masked sum is an exact select); its column is j = t − offx[i],
#      selected with a second one-hot mask against a lane iota.
#
# This is the vectorized equivalent of DCLA's sort-the-smaller-side +
# early-break pairwise loop (pk_compute.cpp:61-110): work is
# O(CL·CR + cap·(CL+CR)) per window instead of O(σ^k).

def _cumsum_sublanes_mxu(x: jnp.ndarray, lower_incl: jnp.ndarray
                         ) -> jnp.ndarray:
    """Inclusive int32 cumsum along dim 0 of a [128, n] tile, exactly, on
    the MXU. TPU matmuls multiply in bf16 (8-bit mantissa), so a single
    triangular matmul truncates counts above 256; splitting the counts into
    base-256 digits keeps every product exact (digits < 2^8, the 0/1
    triangular factor exact, f32 accumulation exact below 2^24)."""
    xf = x.astype(jnp.float32)
    hi = jnp.floor(xf * (1.0 / 256.0))
    lo = xf - hi * 256.0
    cum = (jnp.dot(lower_incl, hi, preferred_element_type=jnp.float32)
           * 256.0
           + jnp.dot(lower_incl, lo, preferred_element_type=jnp.float32))
    return cum.astype(jnp.int32)


def _select_kernel(eps_ref, slT_ref, clT_ref, sr_ref, srT_ref, crT_ref,
                   os_ref, ol_ref, or_ref, tot_ref, *,
                   w_blk: int, nIC: int, nJC: int, nTC: int):
    g = pl.program_id(0)
    wb = pl.program_id(1)

    r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    lower_incl = (r128 >= c128).astype(jnp.float32)
    if nIC > 1:
        subn = jax.lax.broadcasted_iota(jnp.int32, (nIC, 1), 0)
    t_base = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    j_col = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

    # zero-initialize whole output blocks once (extraction skips dead tiles)
    os_ref[0] = jnp.full((w_blk, nTC, 128), NEG_INF, jnp.float32)
    ol_ref[0] = jnp.zeros((w_blk, nTC, 128), jnp.int32)
    or_ref[0] = jnp.zeros((w_blk, nTC, 128), jnp.int32)

    def per_window(w, _):
        eps = eps_ref[g, wb * w_blk + w]
        slT = slT_ref[0, pl.ds(w, 1)][0]                # [128, nIC]
        clT = clT_ref[0, pl.ds(w, 1)][0]
        sr2 = sr_ref[0, pl.ds(w, 1)][0]                 # [nJC, 128]
        srT = srT_ref[0, pl.ds(w, 1)][0]                # [128, nJC]
        crT = crT_ref[0, pl.ds(w, 1)][0]

        # 1. staircase profile: per-row survivor counts (int32, exact).
        # Accumulate alive-masks elementwise in 2D and reduce once per
        # i-chunk — a lane reduction inside the inner loop would serialize
        # the VPU (measured ~5x slower).
        cnt_cols = []
        for a in range(nIC):
            li = slT[:, a:a + 1]                        # [128, 1]
            acc2 = jnp.zeros((128, 128), jnp.int32)
            for b in range(nJC):
                T = li + sr2[b:b + 1, :]                # [128, 128] outer sum
                acc2 = acc2 + (T > eps).astype(jnp.int32)
            cnt_cols.append(jnp.sum(acc2, axis=1, keepdims=True))
        cnt_mat = (jnp.concatenate(cnt_cols, axis=1) if nIC > 1
                   else cnt_cols[0])                    # [128, nIC]

        # 2. flat exclusive offsets (i = a·128 + r, r fastest), exact int32
        cum = _cumsum_sublanes_mxu(cnt_mat, lower_incl)
        if nIC > 1:
            ct_col = jnp.transpose(cum[127:128, :])     # [nIC, 1]
            z = ct_col
            for s in (1, 2, 4, 8):
                if s >= nIC:
                    break
                z = z + jnp.where(subn >= s, pltpu.roll(z, s, 0), 0)
            coloff = jnp.transpose(z - ct_col)          # [1, nIC] exclusive
            offx_incl = cum + coloff
        else:
            offx_incl = cum
        offx_excl = offx_incl - cnt_mat
        total = offx_incl[127:128, nIC - 1:nIC]         # [1, 1]
        tot_ref[0, pl.ds(w, 1), :] = jnp.broadcast_to(total, (1, 128))
        total_s = jnp.sum(total)                        # scalar for pl.when

        # 3. extract one 128-slot lane tile at a time, skipping tiles past
        # the window's survivor count (the kernel's analog of DCLA's early
        # break, pk_compute.cpp:90-94); skipped tiles keep the block-level
        # (-inf, 0) prefill
        for tc in range(nTC):
            @pl.when(total_s > 128 * tc)
            def _(tc=tc):
                t_row = t_base + np.int32(128 * tc)     # [1, 128]
                # one live (row, slot) term per slot → 2D accumulation is
                # exact; reduce over sublanes once per quantity. Register
                # accumulators beat both per-tile reductions and pl.when-
                # skipped VMEM scratch accumulation (measured).
                acc_sl = jnp.zeros((128, 128), jnp.float32)
                acc_cl = jnp.zeros((128, 128), jnp.int32)
                acc_prev = jnp.zeros((128, 128), jnp.int32)
                for a in range(nIC):
                    lo = offx_excl[:, a:a + 1]
                    hi = offx_incl[:, a:a + 1]
                    M = (lo <= t_row) & (t_row < hi)    # [128, 128]
                    acc_sl = acc_sl + jnp.where(M, slT[:, a:a + 1], 0.0)
                    acc_cl = acc_cl + jnp.where(M, clT[:, a:a + 1], 0)
                    acc_prev = acc_prev + jnp.where(M, lo, 0)
                sel_sl = jnp.sum(acc_sl, axis=0, keepdims=True)
                sel_cl = jnp.sum(acc_cl, axis=0, keepdims=True)
                sel_prev = jnp.sum(acc_prev, axis=0, keepdims=True)
                jj = t_row - sel_prev                   # [1, 128] int32
                acc_sr = jnp.zeros((128, 128), jnp.float32)
                acc_cr = jnp.zeros((128, 128), jnp.int32)
                for b in range(nJC):
                    N = (j_col + np.int32(128 * b)) == jj  # one-hot
                    acc_sr = acc_sr + jnp.where(N, srT[:, b:b + 1], 0.0)
                    acc_cr = acc_cr + jnp.where(N, crT[:, b:b + 1], 0)
                sel_sr = jnp.sum(acc_sr, axis=0, keepdims=True)
                sel_cr = jnp.sum(acc_cr, axis=0, keepdims=True)
                valid = t_row < jnp.broadcast_to(total, (1, 128))
                s_out = jnp.where(valid, sel_sl + sel_sr, NEG_INF)
                os_ref[0, pl.ds(w, 1), tc, :] = s_out
                ol_ref[0, pl.ds(w, 1), tc, :] = jnp.where(valid, sel_cl, 0)
                or_ref[0, pl.ds(w, 1), tc, :] = jnp.where(valid, sel_cr, 0)
        return 0

    jax.lax.fori_loop(0, w_blk, per_window, 0)


def _pad_lists(s, c, n_pad, axis):
    """Pad (score, code) lists with (-inf, 0) along `axis`."""
    if n_pad == 0:
        return s, c
    shp = list(s.shape)
    shp[axis] = n_pad
    s = jnp.concatenate([s, jnp.full(shp, NEG_INF, jnp.float32)], axis=axis)
    c = jnp.concatenate([c, jnp.zeros(shp, jnp.int32)], axis=axis)
    return s, c


@functools.partial(jax.jit, static_argnames=("cap", "w_blk", "interpret"))
def staircase_select(sL: jnp.ndarray, cL: jnp.ndarray, sR: jnp.ndarray,
                     cR: jnp.ndarray, eps: jnp.ndarray, *, cap: int,
                     w_blk: int | None = None,
                     interpret: bool | None = None):
    """Capacity-bounded threshold combine of two survivor lists.

    sL/cL: [G, W, CL] f32 scores / uint32 codes (any order); sR/cR:
    [G, W, CR] sorted score-descending (required: the staircase prefix
    property); eps: [G, W] per-window thresholds. Emits all pairs with
    ``fl(sL[i]+sR[j]) > eps`` (strict, exact f32) compacted row-major
    (i asc, j asc) as (code_l [G, W, cap] uint32, code_r,
    scores [G, W, cap] f32, totals [G, W] int32). Slots at or beyond a
    window's total have score -inf (codes zero); totals > cap means the
    window overflowed (its list is truncated) and the caller must retry
    with a larger cap.
    """
    if interpret is None:
        interpret = INTERPRET
    G, W, CL = sL.shape
    CR = sR.shape[2]
    assert cap % 128 == 0, cap
    nIC = -(-CL // 128)
    nJC = -(-CR // 128)
    nTC = cap // 128
    if w_blk is None:
        w_blk = 8
    # the tot output block (1, w_blk, 128) needs a sublane-aligned w_blk
    w_blk = max(8, min(-(-w_blk // 8) * 8, -(-W // 8) * 8))
    Wp = -(-W // w_blk) * w_blk

    cLi = jax.lax.bitcast_convert_type(cL, jnp.int32)
    cRi = jax.lax.bitcast_convert_type(cR, jnp.int32)
    sLp, cLi = _pad_lists(sL, cLi, nIC * 128 - CL, axis=2)
    sRp, cRi = _pad_lists(sR, cRi, nJC * 128 - CR, axis=2)
    epsp = eps
    if Wp != W:
        sLp, cLi = _pad_lists(sLp, cLi, Wp - W, axis=1)
        sRp, cRi = _pad_lists(sRp, cRi, Wp - W, axis=1)
        # +inf threshold: padded windows emit nothing
        epsp = jnp.concatenate(
            [epsp, jnp.full((G, Wp - W), np.inf, jnp.float32)], axis=1)

    # chunk-row 4D layout: [G, W, n·128] → [G, W, n, 128] so in-kernel tiles
    # are static slices (last two dims untiled by the grid). The kernel
    # consumes L (and the extraction view of R) column-major, so those are
    # transposed HERE by XLA — in-kernel transposes cost ~1/3 of the kernel.
    slT = jnp.swapaxes(sLp.reshape(G, Wp, nIC, 128), 2, 3)   # [G,W,128,nIC]
    clT = jnp.swapaxes(cLi.reshape(G, Wp, nIC, 128), 2, 3)
    sR4 = sRp.reshape(G, Wp, nJC, 128)
    srT = jnp.swapaxes(sR4, 2, 3)                            # [G,W,128,nJC]
    crT = jnp.swapaxes(cRi.reshape(G, Wp, nJC, 128), 2, 3)

    kernel = functools.partial(_select_kernel, w_blk=w_blk, nIC=nIC,
                               nJC=nJC, nTC=nTC)
    out_shape = [jax.ShapeDtypeStruct((G, Wp, nTC, 128), jnp.float32),
                 jax.ShapeDtypeStruct((G, Wp, nTC, 128), jnp.int32),
                 jax.ShapeDtypeStruct((G, Wp, nTC, 128), jnp.int32),
                 jax.ShapeDtypeStruct((G, Wp, 128), jnp.int32)]
    out_specs = [pl.BlockSpec((1, w_blk, nTC, 128),
                              lambda g, wb: (g, wb, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(3)]
    out_specs.append(pl.BlockSpec((1, w_blk, 128), lambda g, wb: (g, wb, 0),
                                  memory_space=pltpu.VMEM))

    def spec_t(n):
        return pl.BlockSpec((1, w_blk, 128, n), lambda g, wb: (g, wb, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),          # eps, whole array
        spec_t(nIC), spec_t(nIC),
        pl.BlockSpec((1, w_blk, nJC, 128), lambda g, wb: (g, wb, 0, 0),
                     memory_space=pltpu.VMEM),
        spec_t(nJC), spec_t(nJC),
    ]
    scores, ol, orr, tot = pl.pallas_call(
        kernel,
        grid=(G, Wp // w_blk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(epsp, slT, clT, sR4, srT, crT)
    scores = scores.reshape(G, Wp, nTC * 128)[:, :W, :cap]
    clu = jax.lax.bitcast_convert_type(
        ol.reshape(G, Wp, nTC * 128)[:, :W, :cap], jnp.uint32)
    cru = jax.lax.bitcast_convert_type(
        orr.reshape(G, Wp, nTC * 128)[:, :W, :cap], jnp.uint32)
    return clu, cru, scores, tot[:, :W, 0]


# ---------------------------------------------------------------------------
# batched bitonic sort (lane-axis, descending by (score, code asc))
# ---------------------------------------------------------------------------
#
# XLA's variadic sort costs ~0.7 us/window on the survivor-list widths the
# sparse path sorts (measured: [32, 195, 400] in 4.4 ms) — several times the
# whole per-window budget of the AA configs. A bitonic network over lanes is
# pure elementwise work (2 rolls + compare/selects per stage), runs at VPU
# speed, and sorts the (score, code) pair by the deterministic total order
# (score desc, code asc) — codes are distinct within every survivor list, so
# no stability is needed and the XLA fallback (`lax.sort` with two keys)
# produces the bit-identical permutation on every platform.

def _bitonic_kernel(s_ref, c_ref, os_ref, oc_ref, *, Cp: int, nt: int):
    # Layout: each window's Cp lanes are folded into nt consecutive ROWS of
    # 128 (done by XLA outside) — rolls never cross a 128-lane tile: lane
    # stages (j < 128) are single-tile lane rotates, subtile stages
    # (j = 128*m) are sublane rotates. Multi-tile lane rolls measured ~4x
    # slower than this folded form on [64, 512] blocks.
    s = s_ref[...]
    c = c_ref[...]
    R = s.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    idx = (sub % nt) * 128 + lane           # element index within its window
    k = 2
    while k <= Cp:
        j = k // 2
        while j >= 1:
            right = (idx & j) == 0          # partner sits j positions later
            if j < 128:
                ps = jnp.where(right, pltpu.roll(s, 128 - j, 1),
                               pltpu.roll(s, j, 1))
                pc = jnp.where(right, pltpu.roll(c, 128 - j, 1),
                               pltpu.roll(c, j, 1))
            else:
                m = j // 128                # whole-subtile exchange
                ps = jnp.where(right, pltpu.roll(s, R - m, 0),
                               pltpu.roll(s, m, 0))
                pc = jnp.where(right, pltpu.roll(c, R - m, 0),
                               pltpu.roll(c, m, 0))
            desc = (idx & k) == 0           # block direction this stage
            keep_max = right == desc
            pwins = (ps > s) | ((ps == s) & (pc < c))
            take = pwins == keep_max
            s = jnp.where(take, ps, s)
            c = jnp.where(take, pc, c)
            j //= 2
        k *= 2
    os_ref[...] = s
    oc_ref[...] = c


@functools.partial(jax.jit, static_argnames=("w_blk", "interpret"))
def sort_pairs_desc(scores: jnp.ndarray, codes: jnp.ndarray, *,
                    w_blk: int = 64, interpret: bool | None = None):
    """Sort each row of (scores [..., C] f32, codes [..., C] uint32) by
    (score desc, code asc). Pruned -inf slots sink to the end. Matches
    ``lax.sort`` over the two keys bit-exactly (codes distinct per row)."""
    if interpret is None:
        interpret = INTERPRET
    shape = scores.shape
    C = shape[-1]
    Cp = 1
    while Cp < C:
        Cp *= 2
    Cp = max(Cp, 128)
    N = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    s = scores.reshape(N, C)
    # bitcast codes so the whole kernel is f32/i32; sort order on the int32
    # VIEW of a uint32 differs, so bias by minint to keep unsigned order
    ci = jax.lax.bitcast_convert_type(codes, jnp.int32).reshape(N, C)
    ci = ci ^ np.int32(-0x80000000)
    if Cp != C:
        s = jnp.concatenate(
            [s, jnp.full((N, Cp - C), NEG_INF, jnp.float32)], axis=1)
        ci = jnp.concatenate(
            [ci, jnp.full((N, Cp - C), 0x7fffffff, jnp.int32)], axis=1)
    wb = max(8, min(w_blk, -(-N // 8) * 8))
    Np = -(-N // wb) * wb
    if Np != N:
        s = jnp.concatenate(
            [s, jnp.full((Np - N, Cp), NEG_INF, jnp.float32)], axis=0)
        ci = jnp.concatenate(
            [ci, jnp.full((Np - N, Cp), 0x7fffffff, jnp.int32)], axis=0)
    # fold each window's Cp lanes into nt rows of 128 so in-kernel rolls
    # never cross a lane tile (see _bitonic_kernel)
    nt = Cp // 128
    s = s.reshape(Np * nt, 128)
    ci = ci.reshape(Np * nt, 128)
    out_s, out_c = pl.pallas_call(
        functools.partial(_bitonic_kernel, Cp=Cp, nt=nt),
        grid=(Np // wb,),
        in_specs=[pl.BlockSpec((wb * nt, 128), lambda n: (n, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((wb * nt, 128), lambda n: (n, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((Np * nt, 128), jnp.float32),
                   jax.ShapeDtypeStruct((Np * nt, 128), jnp.int32)],
        interpret=interpret,
    )(s, ci)
    out_s = out_s.reshape(Np, Cp)
    out_c = out_c.reshape(Np, Cp) ^ np.int32(-0x80000000)
    out_s = out_s[:N, :C].reshape(shape)
    out_c = jax.lax.bitcast_convert_type(out_c[:N, :C], jnp.uint32)
    return out_s, out_c.reshape(shape)


# ---------------------------------------------------------------------------
# window-BATCHED staircase combine+select (VERDICT r2 item 1)
# ---------------------------------------------------------------------------
#
# ``staircase_select`` (above) iterates windows serially inside a grid cell;
# its fixed ~2-8 us/window cost is what capped the AA configs at <10x
# (BASELINE.md r2). This variant processes a BLOCK of windows per grid cell
# with windows on sublanes and list entries on lanes, so every phase is
# elementwise [w_blk, 128] tile arithmetic with no per-window loop:
#
#   1. counts  cnt[w, i] = #j: fl(sL[w,i]+sR[w,j]) > eps[w] — a j-loop of
#      broadcast-compare-accumulate over [w_blk, CLp] tiles. sR sorted desc
#      makes column j an upper bound for all later columns, so whole j-chunks
#      past the per-block survivor horizon are pl.when-skipped (the batched
#      analog of DCLA's per-side early break, pk_compute.cpp:61-70).
#   2. offsets: per-window exclusive cumsum over i — ONE [w_blk,CLp]@[CLp,CLp]
#      triangular matmul on the MXU (base-256 digit split keeps it exact).
#   3. extraction: slot t of window w lies in the unique row i with
#      offx[i] <= t < offx[i+1]; offsets are monotone in i REGARDLESS of the
#      left list's order, so the live i-range per 128-slot output tile is
#      contiguous and i-chunks outside it are pl.when-skipped; the column is
#      j = t - offx[i], selected by a one-hot j-loop bounded by the block's
#      max row count. Dead output tiles (beyond the block's max total) keep
#      their (-inf, 0) prefill — work scales with survivors, not capacity.
#
# Emission order and every f32 value are identical to ``staircase_select``
# and ``sparse._staircase_xla``: row-major (i asc in the given left order,
# j asc), scores fl(sL[i]+sR[j]).

def _select_batched_kernel(eps_ref, sl_ref, cl_ref, sr_ref, cr_ref,
                           os_ref, ol_ref, or_ref, tot_ref,
                           cnt_ref, asl_ref, acl_ref, apv_ref,
                           asr_ref, acr_ref, *,
                           CL: int, CR: int, CLp: int, cap: int,
                           jc: int, ic: int):
    nTC = cap // 128
    wb = sl_ref.shape[0]
    sl = sl_ref[...]                       # [wb, CLp]
    sr = sr_ref[...]                       # [wb, CRp]
    eps_col = eps_ref[:, 0:1]              # [wb, 1]
    slmax = jnp.max(sl, axis=1, keepdims=True)

    # 1. counts (j-chunks beyond the survivor horizon skipped: sR desc)
    cnt_ref[...] = jnp.zeros((wb, CLp), jnp.int32)
    for c0 in range(0, CR, jc):
        live = jnp.max(slmax + sr[:, c0:c0 + 1] - eps_col) > 0.0
        @pl.when(live)
        def _(c0=c0):
            acc = cnt_ref[...]
            for j in range(c0, min(c0 + jc, CR)):
                T = sl + sr[:, j:j + 1]
                acc = acc + (T > eps_col).astype(jnp.int32)
            cnt_ref[...] = acc
    cnt = cnt_ref[...]

    # 2. offsets: exact lane-axis cumsum on the MXU (counts < 2^16, digits
    # exact in bf16, accumulation f32-exact below 2^24)
    rr = jax.lax.broadcasted_iota(jnp.int32, (CLp, CLp), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (CLp, CLp), 1)
    upper_incl = (rr <= cc).astype(jnp.float32)
    cntf = cnt.astype(jnp.float32)
    hi = jnp.floor(cntf * (1.0 / 256.0))
    lo = cntf - hi * 256.0
    offi = (jnp.dot(hi, upper_incl, preferred_element_type=jnp.float32)
            * 256.0
            + jnp.dot(lo, upper_incl, preferred_element_type=jnp.float32)
            ).astype(jnp.int32)            # [wb, CLp] inclusive
    offe = offi - cnt
    total_col = offi[:, CL - 1:CL]         # [wb, 1]
    tot_ref[...] = jnp.broadcast_to(total_col, (wb, 128))
    max_total = jnp.max(total_col)
    max_cnt = jnp.max(cnt)

    # 3. prefill (skipped output tiles keep this)
    os_ref[...] = jnp.full((wb, nTC * 128), NEG_INF, jnp.float32)
    ol_ref[...] = jnp.zeros((wb, nTC * 128), jnp.int32)
    or_ref[...] = jnp.zeros((wb, nTC * 128), jnp.int32)

    # 4. extraction, one 128-slot lane tile at a time
    for tc in range(nTC):
        @pl.when(max_total > 128 * tc)
        def _(tc=tc):
            t_row = (jax.lax.broadcasted_iota(jnp.int32, (wb, 128), 1)
                     + np.int32(128 * tc))
            asl_ref[...] = jnp.zeros((wb, 128), jnp.float32)
            acl_ref[...] = jnp.zeros((wb, 128), jnp.int32)
            apv_ref[...] = jnp.zeros((wb, 128), jnp.int32)
            for i0 in range(0, CL, ic):
                i1 = min(i0 + ic, CL)
                # offsets are monotone in i: live i-range is contiguous and
                # bounded by the chunk-edge extrema over the block
                live_i = ((jnp.min(offe[:, i0:i0 + 1]) < 128 * (tc + 1))
                          & (jnp.max(offi[:, i1 - 1:i1]) > 128 * tc))
                @pl.when(live_i)
                def _(i0=i0, i1=i1, t_row=t_row):
                    a_sl = asl_ref[...]
                    a_cl = acl_ref[...]
                    a_pv = apv_ref[...]
                    for i in range(i0, i1):
                        lo_c = offe[:, i:i + 1]
                        hi_c = offi[:, i:i + 1]
                        M = (lo_c <= t_row) & (t_row < hi_c)
                        a_sl = a_sl + jnp.where(M, sl[:, i:i + 1], 0.0)
                        a_cl = a_cl + jnp.where(M, cl_ref[:, i:i + 1], 0)
                        a_pv = a_pv + jnp.where(M, lo_c, 0)
                    asl_ref[...] = a_sl
                    acl_ref[...] = a_cl
                    apv_ref[...] = a_pv
            jj = t_row - apv_ref[...]
            asr_ref[...] = jnp.zeros((wb, 128), jnp.float32)
            acr_ref[...] = jnp.zeros((wb, 128), jnp.int32)
            for j0 in range(0, CR, jc):
                @pl.when(max_cnt > j0)
                def _(j0=j0, jj=jj):
                    a_sr = asr_ref[...]
                    a_cr = acr_ref[...]
                    for j in range(j0, min(j0 + jc, CR)):
                        N = jj == j
                        a_sr = a_sr + jnp.where(N, sr[:, j:j + 1], 0.0)
                        a_cr = a_cr + jnp.where(N, cr_ref[:, j:j + 1], 0)
                    asr_ref[...] = a_sr
                    acr_ref[...] = a_cr
            valid = t_row < total_col
            os_ref[:, 128 * tc:128 * (tc + 1)] = jnp.where(
                valid, asl_ref[...] + asr_ref[...], NEG_INF)
            ol_ref[:, 128 * tc:128 * (tc + 1)] = jnp.where(
                valid, acl_ref[...], 0)
            or_ref[:, 128 * tc:128 * (tc + 1)] = jnp.where(
                valid, acr_ref[...], 0)


@functools.partial(jax.jit, static_argnames=("cap", "w_blk", "interpret"))
def staircase_select_batched(sL: jnp.ndarray, cL: jnp.ndarray,
                             sR: jnp.ndarray, cR: jnp.ndarray,
                             eps: jnp.ndarray, *, cap: int,
                             w_blk: int = 32,
                             interpret: bool | None = None):
    """Window-batched capacity-bounded threshold combine (same contract,
    emission order and f32 values as :func:`staircase_select`).

    sL/cL: [G, W, CL] f32 scores / uint32 codes (any order); sR/cR: [G, W,
    CR] sorted (score desc, code asc); eps: [G, W]. Returns (code_l, code_r
    [G, W, cap] uint32, scores [G, W, cap] f32, totals [G, W] int32).
    """
    if interpret is None:
        interpret = INTERPRET
    G, W, CL = sL.shape
    CR = sR.shape[2]
    assert cap % 128 == 0, cap
    N = G * W
    CLp = -(-CL // 128) * 128
    CRp = -(-CR // 128) * 128
    wb = max(8, min(w_blk, -(-N // 8) * 8))
    Np = -(-N // wb) * wb

    cLi = jax.lax.bitcast_convert_type(cL, jnp.int32).reshape(N, CL)
    cRi = jax.lax.bitcast_convert_type(cR, jnp.int32).reshape(N, CR)
    sl, cl = _pad_lists(sL.reshape(N, CL), cLi, CLp - CL, axis=1)
    sr, cr = _pad_lists(sR.reshape(N, CR), cRi, CRp - CR, axis=1)
    epsb = jnp.broadcast_to(eps.reshape(N, 1), (N, 128))
    if Np != N:
        sl, cl = _pad_lists(sl, cl, Np - N, axis=0)
        sr, cr = _pad_lists(sr, cr, Np - N, axis=0)
        # +inf threshold: padded windows emit nothing
        epsb = jnp.concatenate(
            [epsb, jnp.full((Np - N, 128), np.inf, jnp.float32)], axis=0)

    kernel = functools.partial(_select_batched_kernel, CL=CL, CR=CR,
                               CLp=CLp, cap=cap, jc=64, ic=64)
    nTC = cap // 128
    out_shape = [jax.ShapeDtypeStruct((Np, nTC * 128), jnp.float32),
                 jax.ShapeDtypeStruct((Np, nTC * 128), jnp.int32),
                 jax.ShapeDtypeStruct((Np, nTC * 128), jnp.int32),
                 jax.ShapeDtypeStruct((Np, 128), jnp.int32)]
    out_specs = [pl.BlockSpec((wb, nTC * 128), lambda n: (n, 0),
                              memory_space=pltpu.VMEM) for _ in range(3)]
    out_specs.append(pl.BlockSpec((wb, 128), lambda n: (n, 0),
                                  memory_space=pltpu.VMEM))

    scores, ol, orr, tot = pl.pallas_call(
        kernel,
        grid=(Np // wb,),
        in_specs=[
            pl.BlockSpec((wb, 128), lambda n: (n, 0),
                         memory_space=pltpu.VMEM),      # eps
            pl.BlockSpec((wb, CLp), lambda n: (n, 0),
                         memory_space=pltpu.VMEM),      # sL
            pl.BlockSpec((wb, CLp), lambda n: (n, 0),
                         memory_space=pltpu.VMEM),      # cL
            pl.BlockSpec((wb, CRp), lambda n: (n, 0),
                         memory_space=pltpu.VMEM),      # sR
            pl.BlockSpec((wb, CRp), lambda n: (n, 0),
                         memory_space=pltpu.VMEM),      # cR
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((wb, CLp), jnp.int32),
                        pltpu.VMEM((wb, 128), jnp.float32),
                        pltpu.VMEM((wb, 128), jnp.int32),
                        pltpu.VMEM((wb, 128), jnp.int32),
                        pltpu.VMEM((wb, 128), jnp.float32),
                        pltpu.VMEM((wb, 128), jnp.int32)],
        interpret=interpret,
    )(epsb, sl, cl, sr, cr)
    scores = scores[:N, :cap].reshape(G, W, cap)
    clu = jax.lax.bitcast_convert_type(ol[:N, :cap], jnp.uint32
                                       ).reshape(G, W, cap)
    cru = jax.lax.bitcast_convert_type(orr[:N, :cap], jnp.uint32
                                       ).reshape(G, W, cap)
    return clu, cru, scores, tot[:N, 0].reshape(G, W)


# ---------------------------------------------------------------------------
# wide staircase kernel: windows on LANES, dynamic data-dependent loops
# ---------------------------------------------------------------------------
#
# ``staircase_select_batched`` (above) unrolls its i/j loops as static lane
# slices, so its program size — and Mosaic compile time — grows with
# CL + CR + cap (measured ~150 s for the aa_k6 top span), and its skipping
# is chunk-granular over a whole window block. This variant transposes the
# layout: windows on lanes (blocks of 128), list entries / output slots on
# SUBLANES, where dynamic indexing (``pl.ds``) IS lowerable. Every hot loop
# becomes a ``fori_loop`` with a data-dependent trip count:
#
#   * the count j-loop runs to the block's survivor horizon (first sR row
#     dead for every window — DCLA's per-side break, pk_compute.cpp:61-70),
#   * the extraction output-tile loop runs to ceil(max_total/128),
#   * the per-tile i-loop runs over [i_lo, i_hi) computed EXACTLY from the
#     monotone offsets (a 2-reduction rank query per tile),
#   * the one-hot j-loop runs to the tile's true max column.
#
# Program size is O(1): compile is seconds regardless of list widths, and
# work scales with actual survivors per 128-window block. The cap axis is
# blocked by the grid (cap_blk sublanes per cell) with counts/offsets
# computed once per window block into persistent scratch.

def _select_wide_kernel(aux_ref, sl_ref, cl_ref, sr_ref, cr_ref,
                        os_ref, ol_ref, or_ref, tot_ref,
                        offi_ref, offe_ref, *,
                        CL: int, CLp: int, cap_blk: int):
    cb = pl.program_id(1)
    wb = aux_ref.shape[1]
    eps_row = aux_ref[0:1, :]               # [1, wb] (rows 0-3: eps copies)
    slmax = aux_ref[4:5, :]                 # rows 4-7: slmax copies

    @pl.when(cb == 0)
    def _():
        sl = sl_ref[...]                    # [CLp, wb]
        # survivor horizon: rows of sR no window can pair with are skipped
        # entirely (sR sorted desc per window/lane)
        alive = (slmax + sr_ref[...] > eps_row).astype(jnp.int32)
        jhor = jnp.max(jnp.sum(alive, axis=0))

        def cbody(j, cnt):
            srj = sr_ref[pl.ds(j, 1), :]    # [1, wb]
            return cnt + (sl + srj > eps_row).astype(jnp.int32)
        cnt = jax.lax.fori_loop(
            0, jhor, cbody, jnp.zeros((CLp, wb), jnp.int32))

        # offsets: inclusive cumsum over sublanes, 128 rows per MXU pass
        # with a cross-tile carry (exact: digit-split, totals < 2^24)
        r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        lower_incl = (r128 >= c128).astype(jnp.float32)
        carry = jnp.zeros((1, wb), jnp.int32)
        for a in range(CLp // 128):
            tile = jax.lax.slice(cnt, (a * 128, 0), ((a + 1) * 128, wb))
            cum = _cumsum_sublanes_mxu(tile, lower_incl) + carry
            offi_ref[a * 128:(a + 1) * 128, :] = cum
            offe_ref[a * 128:(a + 1) * 128, :] = cum - tile
            carry = jax.lax.slice(cum, (127, 0), (128, wb))
        total = offi_ref[CL - 1:CL, :]
        tot_ref[...] = jnp.broadcast_to(total, tot_ref.shape)

    total_row = tot_ref[0:1, :]
    max_total = jnp.max(total_row)

    # prefill this cap block (tiles beyond the live range keep it)
    os_ref[...] = jnp.full((cap_blk, wb), NEG_INF, jnp.float32)
    ol_ref[...] = jnp.zeros((cap_blk, wb), jnp.int32)
    or_ref[...] = jnp.zeros((cap_blk, wb), jnp.int32)

    t_base = cb * cap_blk
    live_tiles = jnp.clip((max_total - t_base + 127) // 128, 0,
                          cap_blk // 128)

    def tile_body(tcl, _):
        t0 = t_base + tcl * 128
        t_col = (jax.lax.broadcasted_iota(jnp.int32, (128, wb), 0) + t0)
        # exact live row range from the monotone offsets: a rank query
        offi_all = offi_ref[...]
        offe_all = offe_ref[...]
        i_lo = jnp.min(jnp.sum((offi_all <= t0).astype(jnp.int32), axis=0))
        i_hi = jnp.max(jnp.sum((offe_all < t0 + 128).astype(jnp.int32),
                               axis=0))

        def ibody(i, acc):
            a_sl, a_cl, a_pv = acc
            lo = offe_ref[pl.ds(i, 1), :]
            hi = offi_ref[pl.ds(i, 1), :]
            M = (lo <= t_col) & (t_col < hi)
            a_sl = a_sl + jnp.where(M, sl_ref[pl.ds(i, 1), :], 0.0)
            a_cl = a_cl + jnp.where(M, cl_ref[pl.ds(i, 1), :], 0)
            a_pv = a_pv + jnp.where(M, lo, 0)
            return a_sl, a_cl, a_pv
        zf = jnp.zeros((128, wb), jnp.float32)
        zi = jnp.zeros((128, wb), jnp.int32)
        a_sl, a_cl, a_pv = jax.lax.fori_loop(
            i_lo, jnp.minimum(i_hi, CL), ibody, (zf, zi, zi))

        valid = t_col < total_row
        jj = t_col - a_pv
        jmax = jnp.max(jnp.where(valid, jj, -1))

        def jbody(j, acc):
            a_sr, a_cr = acc
            N = jj == j
            a_sr = a_sr + jnp.where(N, sr_ref[pl.ds(j, 1), :], 0.0)
            a_cr = a_cr + jnp.where(N, cr_ref[pl.ds(j, 1), :], 0)
            return a_sr, a_cr
        a_sr, a_cr = jax.lax.fori_loop(0, jmax + 1, jbody, (zf, zi))

        os_ref[pl.ds(tcl * 128, 128), :] = jnp.where(
            valid, a_sl + a_sr, NEG_INF)
        ol_ref[pl.ds(tcl * 128, 128), :] = jnp.where(valid, a_cl, 0)
        or_ref[pl.ds(tcl * 128, 128), :] = jnp.where(valid, a_cr, 0)
        return 0

    jax.lax.fori_loop(0, live_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def staircase_select_wide(sL: jnp.ndarray, cL: jnp.ndarray,
                          sR: jnp.ndarray, cR: jnp.ndarray,
                          eps: jnp.ndarray, *, cap: int,
                          interpret: bool | None = None):
    """Same contract, emission order and f32 values as
    :func:`staircase_select` / :func:`staircase_select_batched`;
    O(1) program size and data-dependent work (see module comment above).

    sL/cL: [G, W, CL] f32/uint32 (any order); sR/cR: [G, W, CR] sorted
    (score desc); eps: [G, W]. Returns (code_l, code_r [G, W, cap] uint32,
    scores [G, W, cap] f32, totals [G, W] int32).
    """
    if interpret is None:
        interpret = INTERPRET
    G, W, CL = sL.shape
    CR = sR.shape[2]
    assert cap % 128 == 0, cap
    N = G * W
    Np = -(-N // 128) * 128
    CLp = -(-CL // 128) * 128
    CRp = -(-CR // 8) * 8
    cap_blk = min(cap, 1024)
    nCB = -(-cap // cap_blk)
    cap_pad = nCB * cap_blk

    def to_wide(x, C, Cp, fill):
        x = x.reshape(N, C)
        if Np != N:
            x = jnp.concatenate(
                [x, jnp.full((Np - N, C), fill, x.dtype)], axis=0)
        x = jnp.swapaxes(x, 0, 1)                     # [C, Np]
        if Cp != C:
            x = jnp.concatenate(
                [x, jnp.full((Cp - C, Np), fill, x.dtype)], axis=0)
        return x

    cLi = jax.lax.bitcast_convert_type(cL, jnp.int32)
    cRi = jax.lax.bitcast_convert_type(cR, jnp.int32)
    slw = to_wide(sL, CL, CLp, NEG_INF)
    clw = to_wide(cLi, CL, CLp, 0)
    srw = to_wide(sR, CR, CRp, NEG_INF)
    crw = to_wide(cRi, CR, CRp, 0)
    slmax = jnp.max(sL.reshape(N, CL), axis=1)        # [N]
    epsf = eps.reshape(N)
    if Np != N:
        # +inf threshold: padded windows emit nothing
        epsf = jnp.concatenate(
            [epsf, jnp.full((Np - N,), np.inf, jnp.float32)])
        slmax = jnp.concatenate(
            [slmax, jnp.full((Np - N,), NEG_INF, jnp.float32)])
    aux = jnp.broadcast_to(
        jnp.stack([epsf, slmax])[:, None, :], (2, 4, Np)).reshape(8, Np)

    kernel = functools.partial(_select_wide_kernel, CL=CL, CLp=CLp,
                               cap_blk=cap_blk)
    out_shape = [jax.ShapeDtypeStruct((cap_pad, Np), jnp.float32),
                 jax.ShapeDtypeStruct((cap_pad, Np), jnp.int32),
                 jax.ShapeDtypeStruct((cap_pad, Np), jnp.int32),
                 jax.ShapeDtypeStruct((8, Np), jnp.int32)]
    out_specs = [pl.BlockSpec((cap_blk, 128), lambda n, cb: (cb, n),
                              memory_space=pltpu.VMEM) for _ in range(3)]
    out_specs.append(pl.BlockSpec((8, 128), lambda n, cb: (0, n),
                                  memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((8, 128), lambda n, cb: (0, n),
                     memory_space=pltpu.VMEM),        # aux
        pl.BlockSpec((CLp, 128), lambda n, cb: (0, n),
                     memory_space=pltpu.VMEM),        # sL
        pl.BlockSpec((CLp, 128), lambda n, cb: (0, n),
                     memory_space=pltpu.VMEM),        # cL
        pl.BlockSpec((CRp, 128), lambda n, cb: (0, n),
                     memory_space=pltpu.VMEM),        # sR
        pl.BlockSpec((CRp, 128), lambda n, cb: (0, n),
                     memory_space=pltpu.VMEM),        # cR
    ]
    scores, ol, orr, tot = pl.pallas_call(
        kernel,
        grid=(Np // 128, nCB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((CLp, 128), jnp.int32),
                        pltpu.VMEM((CLp, 128), jnp.int32)],
        interpret=interpret,
    )(aux, slw, clw, srw, crw)
    scores = jnp.swapaxes(scores, 0, 1)[:N, :cap].reshape(G, W, cap)
    clu = jax.lax.bitcast_convert_type(
        jnp.swapaxes(ol, 0, 1)[:N, :cap], jnp.uint32).reshape(G, W, cap)
    cru = jax.lax.bitcast_convert_type(
        jnp.swapaxes(orr, 0, 1)[:N, :cap], jnp.uint32).reshape(G, W, cap)
    return clu, cru, scores, jnp.swapaxes(tot, 0, 1)[:N, 0].reshape(G, W)
