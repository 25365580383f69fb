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

__all__ = ["combine_max", "accumulate_ghosts_fused",
           "staircase_select_wide", "INTERPRET"]

#: Interpreter mode for CPU testing (set IPK_TPU_INTERPRET=1; tests do).
INTERPRET = os.environ.get("IPK_TPU_INTERPRET", "0") == "1"

#: Split the combine accumulator into even/odd window halves to give the
#: VPU two independent max/count dependency chains (bit-identical output).
#: Measured on chip (r5, interleaved A/B, warm): ~9% SLOWER (394 vs 434
#: Gcand/s) — the extra live tiles cost more than the ILP buys, so the
#: Mosaic schedule is already at its practical issue bound for this op mix.
#: Default off; kept as a knob so the measurement is reproducible (same
#: policy as GROUP_SPANS/SORT_WINDOWS in core/sparse.py).
SPLIT_ACC = os.environ.get("IPK_TPU_SPLIT_ACC", "0") == "1"


def _combine_kernel(L_ref, R_ref, eps_ref, A_ref, *, block_w: int,
                    num_blocks: int, t_chunk: int, with_count: bool,
                    count_ref=None, cacc_ref=None, A2_ref=None,
                    cacc2_ref=None):
    nrb = pl.program_id(1)
    wb = pl.program_id(2)
    nl = A_ref.shape[1]
    split_acc = A2_ref is not None

    @pl.when(wb == 0)
    def _():
        A_ref[:] = jnp.full_like(A_ref, NEG_INF)
        if split_acc:
            A2_ref[:] = jnp.full_like(A2_ref, NEG_INF)
        if with_count:
            cacc_ref[:] = jnp.zeros_like(cacc_ref)
            if split_acc:
                cacc2_ref[:] = jnp.zeros_like(cacc2_ref)
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
        if split_acc:
            # break the per-cell serial max/add chains over windows in two:
            # even windows fold into (A, cacc), odd into (A2, cacc2), merged
            # once at the last block. max is associative/commutative and the
            # count is a sum, so the result is bit-identical; the win (if
            # any) is ILP — two independent dependency chains for the VPU.
            A2 = A2_ref[0]
            cacc2 = cacc2_ref[0] if with_count else None
            for j in range(0, t_chunk - 1, 2):
                T = jax.lax.slice(LT, (0, j), (nl, j + 1)) + Rc[j][None, :]
                T2 = (jax.lax.slice(LT, (0, j + 1), (nl, j + 2))
                      + Rc[j + 1][None, :])
                A = jnp.maximum(A, T)
                A2 = jnp.maximum(A2, T2)
                if with_count:
                    cacc = cacc + (T > eps_ref[0, 0]).astype(jnp.int32)
                    cacc2 = cacc2 + (T2 > eps_ref[0, 0]).astype(jnp.int32)
            if t_chunk % 2:
                T = (jax.lax.slice(LT, (0, t_chunk - 1), (nl, t_chunk))
                     + Rc[t_chunk - 1][None, :])
                A = jnp.maximum(A, T)
                if with_count:
                    cacc = cacc + (T > eps_ref[0, 0]).astype(jnp.int32)
            A2_ref[0] = A2
            if with_count:
                cacc2_ref[0] = cacc2
        else:
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
        if split_acc:
            A = jnp.maximum(A, A2_ref[0])
        A_ref[0] = jnp.where(A > eps_ref[0, 0], A, NEG_INF)
        if with_count:
            # the count output is a VMEM-tiled (1, 8, 128) slab (SMEM outputs
            # cannot be blocked per grid cell, and scalar stores to VMEM are
            # not allowed): broadcast-accumulate the reduced per-nr-block
            # total over the tile (zeroed at nrb == 0, wb == 0 above)
            total = jnp.sum(cacc_ref[0])
            if split_acc:
                total = total + jnp.sum(cacc2_ref[0])
            count_ref[0] = count_ref[0] + total


@functools.partial(jax.jit,
                   static_argnames=("block_w", "with_count", "interpret",
                                    "split_acc"))
def combine_max(L: jnp.ndarray, R: jnp.ndarray, log_threshold, *,
                block_w: int = 256, with_count: bool = False,
                interpret: bool | None = None,
                split_acc: bool | None = None):
    """A[g] = max_w mask(L[g, w] ⊕ R[g, w]) for all ghosts.

    L: [G, W, nl], R: [G, W, nr] f32 (from ``masked_halves``, -inf = pruned).
    Returns A[G, nl, nr] (+ per-ghost surviving-tuple counts when with_count).
    Window padding (to a multiple of block_w) must be -inf rows.
    """
    if interpret is None:
        interpret = INTERPRET
    if split_acc is None:
        split_acc = SPLIT_ACC
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
        if split_acc:
            def kernel(L_ref, R_ref, eps_ref, A_ref, count_ref, cacc_ref,
                       A2_ref, cacc2_ref):
                _combine_kernel(L_ref, R_ref, eps_ref, A_ref, block_w=bw,
                                num_blocks=num_blocks, t_chunk=t_chunk,
                                with_count=True, count_ref=count_ref,
                                cacc_ref=cacc_ref, A2_ref=A2_ref,
                                cacc2_ref=cacc2_ref)
            scratch_shapes = [pltpu.VMEM((1, nl, nr_blk), jnp.int32),
                              pltpu.VMEM((1, nl, nr_blk), jnp.float32),
                              pltpu.VMEM((1, nl, nr_blk), jnp.int32)]
        else:
            def kernel(L_ref, R_ref, eps_ref, A_ref, count_ref, cacc_ref):
                _combine_kernel(L_ref, R_ref, eps_ref, A_ref, block_w=bw,
                                num_blocks=num_blocks, t_chunk=t_chunk,
                                with_count=True, count_ref=count_ref,
                                cacc_ref=cacc_ref)
            scratch_shapes = [pltpu.VMEM((1, nl, nr_blk), jnp.int32)]
        out_shape.append(jax.ShapeDtypeStruct((G, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128),
                                      lambda g, nrb, wb: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
    elif split_acc:
        def kernel(L_ref, R_ref, eps_ref, A_ref, A2_ref):
            _combine_kernel(L_ref, R_ref, eps_ref, A_ref, block_w=bw,
                            num_blocks=num_blocks, t_chunk=t_chunk,
                            with_count=False, A2_ref=A2_ref)
        scratch_shapes = [pltpu.VMEM((1, nl, nr_blk), jnp.float32)]
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
# compacted into `cap` slots — the vectorized equivalent of DCLA's
# sort-the-smaller-side + early-break pairwise loop (pk_compute.cpp:61-110).
#
# Layout: windows on LANES (blocks of 128), list entries / output slots on
# SUBLANES, where dynamic indexing (``pl.ds``) lowers well under Mosaic.
# Earlier per-window and window-batched variants (rounds 2-3) unrolled their
# loops as static lane slices, so program size — and Mosaic compile time —
# grew with CL + CR + cap (~150-500 s for the AA spans), and their fixed
# per-window cost capped the AA configs near CPU parity. This kernel's
# program size is O(1) in the list widths (compile is seconds at any shape)
# and every hot loop has a DATA-DEPENDENT trip count:
#
#   0. both children are sorted in VMEM by (score desc, code asc) with a
#      bitonic network over sublanes — replacing two XLA sort dispatches
#      (~4 ms each, ~2/5 of the whole r3 sparse pass) with ~0.2 us/window
#      of VPU work fused on data already resident in VMEM,
#   1. per-row survivor counts cnt[i] = #j: fl(sL[i]+sR[j]) > eps. R sorted
#      desc makes row i's survivors its first cnt[i] columns (f32 addition
#      is monotone) — the staircase; L sorted desc additionally makes the
#      count loop skippable per 128-row i-tile: the tile's top row bounds
#      the whole tile, so each tile's j-loop runs only to ITS horizon
#      (DCLA's per-side early breaks, pk_compute.cpp:61-70, at tile
#      granularity),
#   2. exclusive offsets: per-window cumsum over i via triangular matmuls
#      on the MXU (base-256 digit split keeps every product exact; f32
#      accumulation exact below 2^24), with a cross-tile carry,
#   3. extraction: slot t of window w lies in the unique sorted-L row i
#      with offx[i] <= t < offx[i+1]; offsets are monotone in i, so the
#      live i-range per 128-slot output tile is EXACT (a 2-reduction rank
#      query) and the one-hot j-loop runs to the tile's true max column.
#      Dead output tiles (beyond the block's max total) keep their
#      (-inf, 0) prefill — work scales with survivors, not capacity.
#
# The cap axis is blocked by the grid (cap_blk sublanes per cell); sorted
# lists, counts and offsets are computed once per window block (cb == 0)
# into scratch that persists across the cap-block grid steps.
#
# Emission order: row-major over (L sorted by (score desc, code asc)) ×
# (R sorted likewise) — ``sparse._staircase_xla`` pre-sorts both children
# with the same two-key order, so fallback and kernel are bit-identical
# including slot order. Codes are compared as UNSIGNED 32-bit (the wrapper
# biases the int32 view by 0x80000000): DNA k=31 half-windows use all 32
# bits.


def _bitonic_sublanes(s, c, Cp: int):
    """Sort [Cp, wb] pairs by (score desc, code asc) along sublanes, per
    lane, with a bitonic network (Cp a power of two; pads must be
    (-inf, 0x7fffffff) so they sink). Codes are int32 but compared in
    unsigned order via the caller's bias. Pure elementwise VPU work:
    log2(Cp)·(log2(Cp)+1)/2 stages of roll + compare/select."""
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    k = 2
    while k <= Cp:
        j = k // 2
        while j >= 1:
            right = (idx & j) == 0          # partner sits j rows later
            ps = jnp.where(right, pltpu.roll(s, Cp - j, 0),
                           pltpu.roll(s, j, 0))
            pc = jnp.where(right, pltpu.roll(c, Cp - j, 0),
                           pltpu.roll(c, j, 0))
            desc = (idx & k) == 0           # block direction this stage
            keep_max = right == desc
            pwins = (ps > s) | ((ps == s) & (pc < c))
            take = pwins == keep_max
            s = jnp.where(take, ps, s)
            c = jnp.where(take, pc, c)
            j //= 2
        k *= 2
    return s, c


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


def _select_wide_kernel(eps_ref, sl_ref, cl_ref, sr_ref, cr_ref,
                        os_ref, ol_ref, or_ref, tot_ref,
                        sls_ref, cls_ref, srs_ref, crs_ref,
                        offi_ref, offe_ref, *,
                        CL: int, CLp: int, CRp: int, cap_blk: int,
                        sort_l: bool, sort_r: bool, compact_r: bool):
    cb = pl.program_id(1)
    wb = eps_ref.shape[1]
    eps_row = eps_ref[0:1, :]               # [1, wb]

    @pl.when(cb == 0)
    def _():
        # 0. in-VMEM two-key sorts (see module comment). R's sort is what
        # makes the survivors a prefix per row; L's is optional (emission
        # order changes, offsets stay monotone either way)
        if sort_l:
            sls, cls = _bitonic_sublanes(sl_ref[...], cl_ref[...], CLp)
        else:
            sls, cls = sl_ref[...], cl_ref[...]
        sls_ref[...] = sls
        cls_ref[...] = cls
        if not sort_r:
            # caller pre-sorted R in XLA (the VMEM-relief route for
            # oversize child widths — see staircase_wide_max_cap_blk)
            srs_ref[...] = sr_ref[...]
            crs_ref[...] = cr_ref[...]
        elif compact_r and CRp >= 256:
            # R is a COMPACT staircase output (all live entries in each
            # lane's prefix): when no lane in the block has more than
            # CRp/2 live rows, the half-width network sorts everything
            # that will ever be read (count/extraction loops stop at the
            # live horizon) at ~2.5x less VPU work
            sr_all = sr_ref[...]
            cr_all = cr_ref[...]
            alive = jnp.sum((sr_all > NEG_INF).astype(jnp.int32), axis=0)
            half = CRp // 2

            @pl.when(jnp.max(alive) <= half)
            def _():
                top_s = jax.lax.slice(sr_all, (0, 0), (half, sr_all.shape[1]))
                top_c = jax.lax.slice(cr_all, (0, 0), (half, cr_all.shape[1]))
                hs, hc = _bitonic_sublanes(top_s, top_c, half)
                srs_ref[0:half, :] = hs
                crs_ref[0:half, :] = hc
                srs_ref[half:, :] = jax.lax.slice(
                    sr_all, (half, 0), (CRp, sr_all.shape[1]))
                crs_ref[half:, :] = jax.lax.slice(
                    cr_all, (half, 0), (CRp, cr_all.shape[1]))

            @pl.when(jnp.max(alive) > half)
            def _():
                fs, fc = _bitonic_sublanes(sr_all, cr_all, CRp)
                srs_ref[...] = fs
                crs_ref[...] = fc
        else:
            srs, crs = _bitonic_sublanes(sr_ref[...], cr_ref[...], CRp)
            srs_ref[...] = srs
            crs_ref[...] = crs

        # 1.+2. per-i-tile counts (the tile's max row bounds its j horizon;
        # with L sorted that is its top row) fused with the MXU offset
        # cumsum + carry. Operands re-read from scratch: the sort section
        # above has data-dependent branches, so the sorted values exist
        # only behind the refs.
        sls = sls_ref[...]
        srs = srs_ref[...]
        r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        lower_incl = (r128 >= c128).astype(jnp.float32)
        carry = jnp.zeros((1, wb), jnp.int32)
        for a in range(CLp // 128):
            tile_sl = jax.lax.slice(sls, (a * 128, 0), ((a + 1) * 128, wb))
            if sort_l:
                top = sls[a * 128:a * 128 + 1, :]       # tile max row
            else:
                top = jnp.max(tile_sl, axis=0, keepdims=True)
            alive = (top + srs > eps_row).astype(jnp.int32)
            jhor = jnp.max(jnp.sum(alive, axis=0))      # tile's j horizon

            def cbody(j, cnt, tile_sl=tile_sl):
                srj = srs_ref[pl.ds(j, 1), :]           # [1, wb]
                return cnt + (tile_sl + srj > eps_row).astype(jnp.int32)
            cnt = jax.lax.fori_loop(
                0, jhor, cbody, jnp.zeros((128, wb), jnp.int32))
            cum = _cumsum_sublanes_mxu(cnt, lower_incl) + carry
            offi_ref[a * 128:(a + 1) * 128, :] = cum
            offe_ref[a * 128:(a + 1) * 128, :] = cum - cnt
            carry = jax.lax.slice(cum, (127, 0), (128, wb))
        total = offi_ref[CL - 1:CL, :]
        tot_ref[...] = jnp.broadcast_to(total, tot_ref.shape)

    total_row = tot_ref[0:1, :]
    max_total = jnp.max(total_row)

    # prefill this cap block (tiles beyond the live range keep it). Codes
    # in-kernel are unsigned-biased; dead slots hold the biased zero so the
    # wrapper's un-bias XOR turns them into the contract's code 0
    bias = np.int32(-0x80000000)
    os_ref[...] = jnp.full((cap_blk, wb), NEG_INF, jnp.float32)
    ol_ref[...] = jnp.full((cap_blk, wb), bias, jnp.int32)
    or_ref[...] = jnp.full((cap_blk, wb), bias, jnp.int32)

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
            a_sl = a_sl + jnp.where(M, sls_ref[pl.ds(i, 1), :], 0.0)
            a_cl = a_cl + jnp.where(M, cls_ref[pl.ds(i, 1), :], 0)
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
            a_sr = a_sr + jnp.where(N, srs_ref[pl.ds(j, 1), :], 0.0)
            a_cr = a_cr + jnp.where(N, crs_ref[pl.ds(j, 1), :], 0)
            return a_sr, a_cr
        a_sr, a_cr = jax.lax.fori_loop(0, jmax + 1, jbody, (zf, zi))

        os_ref[pl.ds(tcl * 128, 128), :] = jnp.where(
            valid, a_sl + a_sr, NEG_INF)
        ol_ref[pl.ds(tcl * 128, 128), :] = jnp.where(valid, a_cl, bias)
        or_ref[pl.ds(tcl * 128, 128), :] = jnp.where(valid, a_cr, bias)
        return 0

    jax.lax.fori_loop(0, live_tiles, tile_body, 0)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def staircase_wide_max_cap_blk(CL: int, CR: int, sort_l: bool = True,
                               sort_r: bool = True,
                               vmem_budget: int = 10 << 20) -> int:
    """Largest cap block (multiple of 128) the wide kernel can allocate for
    these child widths without tripping the ~16 MB scoped-VMEM ceiling.
    Model (calibrated against the compiler's stack accounting — a
    CLp=CRp=1024 sort-both case allocates 17.8 MB, of which the unrolled
    bitonic networks' live temporaries are the dominant unmodeled term):
    double-buffered input blocks + persistent scratch + ~8 live rows per
    sorted operand row; outputs double-buffer per cap row. Returns 0 when
    even cap_blk=128 cannot fit — the caller must use the XLA fallback."""
    CLp = max(128, _next_pow2(CL))
    CRp = max(8, _next_pow2(CR))
    lane_bytes = 128 * 4
    bitonic_rows = (CLp if sort_l else 0) + (CRp if sort_r else 0)
    fixed = (2 * (2 * CLp + 2 * CRp)      # in blocks, double-buffered
             + (4 * CLp + 2 * CRp)        # persistent scratch
             + 8 * bitonic_rows           # bitonic live temporaries
             + 16) * lane_bytes
    if fixed >= vmem_budget:
        return 0
    rows = (vmem_budget - fixed) // (2 * 3 * lane_bytes)
    return (rows // 128) * 128


@functools.partial(jax.jit,
                   static_argnames=("cap", "sort_l", "sort_r", "compact_r",
                                    "interpret"))
def staircase_select_wide(sL: jnp.ndarray, cL: jnp.ndarray,
                          sR: jnp.ndarray, cR: jnp.ndarray,
                          eps: jnp.ndarray, *, cap: int,
                          sort_l: bool = True, sort_r: bool = True,
                          compact_r: bool = False,
                          interpret: bool | None = None):
    """Capacity-bounded threshold combine of two UNSORTED survivor lists.

    sL/cL: [G, W, CL] f32 scores / uint32 codes; sR/cR: [G, W, CR] likewise
    (NO sortedness requirement — both lists are sorted inside the kernel);
    eps: [G, W] per-window thresholds. Emits all pairs with
    ``fl(sL[i]+sR[j]) > eps`` (strict, exact f32) compacted row-major over
    the (score desc, code asc)-sorted views of both lists, as
    (code_l [G, W, cap] uint32, code_r, scores [G, W, cap] f32,
    totals [G, W] int32). Slots at or beyond a window's total have score
    -inf (codes zero); totals > cap means the window overflowed (its list
    is truncated) and the caller must retry with a larger cap. Bit-equal
    (values AND slot order) to ``sparse._staircase_xla`` on pre-sorted
    children.
    """
    if interpret is None:
        interpret = INTERPRET
    G, W, CL = sL.shape
    CR = sR.shape[2]
    assert cap % 128 == 0, cap
    N = G * W
    Np = -(-N // 128) * 128
    CLp = max(128, _next_pow2(CL))   # pow2: the bitonic network needs it;
    CRp = max(8, _next_pow2(CR))     # >=128 for the MXU cumsum tiles
    cap_blk = min(cap, 1024,
                  staircase_wide_max_cap_blk(CL, CR, sort_l=sort_l,
                                             sort_r=sort_r))
    if cap_blk < 128:
        raise ValueError(
            f"staircase_select_wide: lists CL={CL} CR={CR} exceed the VMEM "
            "budget — route to the XLA fallback")
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

    # bias the int32 view of the codes so int32 compare == unsigned compare
    # (DNA k=31 half-windows use all 32 bits); pads carry the max biased
    # code so the two-key order sinks them deterministically
    bias = np.int32(-0x80000000)
    cLi = jax.lax.bitcast_convert_type(cL, jnp.int32) ^ bias
    cRi = jax.lax.bitcast_convert_type(cR, jnp.int32) ^ bias
    pad_code = 0x7fffffff
    slw = to_wide(sL, CL, CLp, NEG_INF)
    clw = to_wide(cLi, CL, CLp, pad_code)
    srw = to_wide(sR, CR, CRp, NEG_INF)
    crw = to_wide(cRi, CR, CRp, pad_code)
    epsf = eps.reshape(N)
    if Np != N:
        # +inf threshold: padded windows emit nothing
        epsf = jnp.concatenate(
            [epsf, jnp.full((Np - N,), np.inf, jnp.float32)])
    epsw = jnp.broadcast_to(epsf[None, :], (8, Np))

    kernel = functools.partial(_select_wide_kernel, CL=CL, CLp=CLp,
                               CRp=CRp, cap_blk=cap_blk, sort_l=sort_l,
                               sort_r=sort_r, compact_r=compact_r)
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
                     memory_space=pltpu.VMEM),        # eps
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
        scratch_shapes=[pltpu.VMEM((CLp, 128), jnp.float32),
                        pltpu.VMEM((CLp, 128), jnp.int32),
                        pltpu.VMEM((CRp, 128), jnp.float32),
                        pltpu.VMEM((CRp, 128), jnp.int32),
                        pltpu.VMEM((CLp, 128), jnp.int32),
                        pltpu.VMEM((CLp, 128), jnp.int32)],
        interpret=interpret,
    )(epsw, slw, clw, srw, crw)
    scores = jnp.swapaxes(scores, 0, 1)[:N, :cap].reshape(G, W, cap)
    clu = jax.lax.bitcast_convert_type(
        jnp.swapaxes(ol, 0, 1)[:N, :cap] ^ bias, jnp.uint32
        ).reshape(G, W, cap)
    cru = jax.lax.bitcast_convert_type(
        jnp.swapaxes(orr, 0, 1)[:N, :cap] ^ bias, jnp.uint32
        ).reshape(G, W, cap)
    return clu, cru, scores, jnp.swapaxes(tot, 0, 1)[:N, 0].reshape(G, W)
