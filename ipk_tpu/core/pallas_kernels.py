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
           "INTERPRET"]

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
