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

__all__ = ["combine_max", "accumulate_ghosts_fused", "staircase_emit",
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
# staircase combine+emit (the sparse large-k path's hot kernel)
# ---------------------------------------------------------------------------

def _emit_kernel(eps_ref, sL_ref, cL_ref, sR_ref, cR_ref,
                 os_ref, ol_ref, or_ref, *, w_blk: int, CL: int, CRp: int,
                 cap: int, T_pad: int):
    """Per window: walk left-list rows (sorted desc) until the first dead
    row, storing each live row's full [CRp] combine at its running offset.

    Correctness of the contiguous emission rests on two properties of
    sorted-descending lists (cf. DCLA's sorted early-break,
    ``pk_compute.cpp:61-110``):
    * survivors of row i form a lane PREFIX of sR (sR sorted desc), so the
      row's dead tail starts exactly at off+cnt — where the NEXT row's store
      begins, overwriting it (ascending-offset overwrite);
    * per-row survivor counts are non-increasing (sL sorted desc), so the
      first row with cnt == 0 ends the window (early exit).
    The last stored row's dead tail is patched with -inf after the loop, so
    finite slots == survivors, in row-major (i asc, j asc) order — the same
    emission order as the XLA fallback. A window whose emission would pass
    ``cap`` stops with off > cap, which the caller detects as overflow via
    the finite count.
    """
    def per_window(w, _):
        eps_w = eps_ref[0, w]
        os_ref[0, pl.ds(w, 1), :] = jnp.full((1, T_pad), NEG_INF,
                                             jnp.float32)
        sR = sR_ref[0, pl.ds(w, 1), :]          # [1, CRp]
        cR = cR_ref[0, pl.ds(w, 1), :]

        def cond(st):
            _, off, alive = st
            return alive & (off <= cap)

        def body(st):
            i, off, _ = st
            sl = sL_ref[0, w, i]
            cl = cL_ref[0, w, i]
            srow = sl + sR
            cnt = jnp.sum((srow > eps_w).astype(jnp.int32))

            @pl.when(cnt > 0)
            def _():
                os_ref[0, pl.ds(w, 1), pl.ds(off, CRp)] = srow
                ol_ref[0, pl.ds(w, 1), pl.ds(off, CRp)] = jnp.full(
                    (1, CRp), cl, jnp.int32)
                or_ref[0, pl.ds(w, 1), pl.ds(off, CRp)] = cR
            alive = (cnt > 0) & (i + 1 < CL)
            return (i + 1, off + cnt, alive)

        _, off, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.bool_(CL > 0)))
        os_ref[0, pl.ds(w, 1), pl.ds(off, CRp)] = jnp.full(
            (1, CRp), NEG_INF, jnp.float32)
        return 0

    jax.lax.fori_loop(0, w_blk, per_window, 0)


@functools.partial(jax.jit, static_argnames=("cap", "w_blk", "interpret"))
def staircase_emit(sL: jnp.ndarray, cL: jnp.ndarray, sR: jnp.ndarray,
                   cR: jnp.ndarray, eps: jnp.ndarray, *, cap: int,
                   w_blk: int | None = None,
                   interpret: bool | None = None):
    """Capacity-bounded threshold combine of two sorted survivor lists.

    sL/cL: [G, W, CL] f32 scores / uint32 codes sorted score-descending;
    sR/cR: [G, W, CR] likewise; eps: [G, W] per-window thresholds.
    Emits all pairs with ``fl(sL[i]+sR[j]) > eps`` (strict, exact f32) as
    (code_l [G, W, cap] uint32, code_r, scores [G, W, cap] f32,
    counts [G, W] int32). Slots beyond a window's count have score -inf
    (codes there are garbage); counts > cap flags overflow — such windows'
    lists are incomplete and the caller must retry with a larger cap.

    Work is O(live_rows · CR) per window — proportional to survivors, not
    to the CL·CR product (the TPU analog of DCLA's early-break pruning).
    """
    if interpret is None:
        interpret = INTERPRET
    G, W, CL = sL.shape
    CR = sR.shape[2]
    if w_blk is None:
        w_blk = 8 if CL <= 1024 else (4 if CL <= 2048 else 2)
    w_blk = max(1, min(w_blk, W))
    CRp = -(-CR // 128) * 128
    Wp = -(-W // w_blk) * w_blk
    T_pad = -(-(cap + 2 * CRp) // 128) * 128

    sLp = sL
    cLi = jax.lax.bitcast_convert_type(cL, jnp.int32)
    sRp = sR
    cRi = jax.lax.bitcast_convert_type(cR, jnp.int32)
    epsp = eps
    if CRp != CR:
        sRp = jnp.concatenate(
            [sRp, jnp.full((G, W, CRp - CR), NEG_INF, jnp.float32)], axis=2)
        cRi = jnp.concatenate(
            [cRi, jnp.zeros((G, W, CRp - CR), jnp.int32)], axis=2)
    if Wp != W:
        pw = Wp - W
        sLp = jnp.concatenate(
            [sLp, jnp.zeros((G, pw, CL), jnp.float32)], axis=1)
        cLi = jnp.concatenate(
            [cLi, jnp.zeros((G, pw, CL), jnp.int32)], axis=1)
        sRp = jnp.concatenate(
            [sRp, jnp.full((G, pw, CRp), NEG_INF, jnp.float32)], axis=1)
        cRi = jnp.concatenate(
            [cRi, jnp.zeros((G, pw, CRp), jnp.int32)], axis=1)
        # +inf threshold: padded windows emit nothing
        epsp = jnp.concatenate(
            [epsp, jnp.full((G, pw), np.inf, jnp.float32)], axis=1)

    kernel = functools.partial(_emit_kernel, w_blk=w_blk, CL=CL, CRp=CRp,
                               cap=cap, T_pad=T_pad)
    out_shape = [jax.ShapeDtypeStruct((G, Wp, T_pad), jnp.float32),
                 jax.ShapeDtypeStruct((G, Wp, T_pad), jnp.int32),
                 jax.ShapeDtypeStruct((G, Wp, T_pad), jnp.int32)]
    out_specs = [pl.BlockSpec((1, w_blk, T_pad), lambda g, wb: (g, wb, 0),
                              memory_space=pltpu.VMEM) for _ in range(3)]
    scores, ol, orr = pl.pallas_call(
        kernel,
        grid=(G, Wp // w_blk),
        in_specs=[
            pl.BlockSpec((1, w_blk), lambda g, wb: (g, wb),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w_blk, CL), lambda g, wb: (g, wb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w_blk, CL), lambda g, wb: (g, wb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w_blk, CRp), lambda g, wb: (g, wb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_blk, CRp), lambda g, wb: (g, wb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(epsp, sLp, cLi, sRp, cRi)
    scores = scores[:, :W]
    counts = jnp.isfinite(scores).sum(axis=2, dtype=jnp.int32)
    clu = jax.lax.bitcast_convert_type(ol[:, :W, :cap], jnp.uint32)
    cru = jax.lax.bitcast_convert_type(orr[:, :W, :cap], jnp.uint32)
    return clu, cru, scores[:, :, :cap], counts
