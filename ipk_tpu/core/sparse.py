"""Capacity-bounded sparse enumeration for large k.

The dense path (``dense.py``) scores all σ^k candidates, which is optimal for
k ≤ ~12 DNA / ~6 AA but grows as σ^k regardless of pruning. The reference
handles large k with recursive survivor lists whose sizes adapt to the data
(``pk_compute.cpp:42-114``); data-dependent sizes are hostile to XLA, so this
module uses the statically-shaped equivalent flagged in SURVEY.md §7.4:
**capacity-bounded survivor lists with overflow detection**.

Per span (j, h) of the same split tree, keep at most ``cap`` surviving
(code, score) pairs per window. Pair selection is a **staircase combine**
(:func:`_staircase_combine`): each level's lists are kept score-descending,
so the survivors of ``sL[i] + sR[j] > eps`` form a prefix in j for every i
(f32 addition is monotone). Counts use the exact f32 predicate via a fused
compare-reduce (regular VPU dataflow — XLA's sort and gather HLOs are an
order of magnitude off speed-of-light at these shapes, so the path uses
neither); extraction maps flat survivor slots back to (i, j) with
membership masks (``offx[i] <= t < offx[i+1]``) reduced by masked sums — a
single live term per slot, so the sums are exact in any order. This is the
vectorized equivalent of DCLA's sort-the-smaller-side + early-break
pairwise loop (``pk_compute.cpp:61-110``).

An overflow flag is returned per ghost so callers can fail loudly and retry
with a larger cap (silent truncation would drop valid k-mers). Scores follow
the identical f32 summation tree, so values are bit-equal to the dense path.

Codes stay ``uint32`` on device (every half-window needs ≤ 32 bits for the
supported k ranges: 31 DNA → 16·2 bits, 12 AA → 6·5 bits); the host packs
the final (prefix, suffix) pairs into reference-layout ``uint64`` keys
(``pk_compute.cpp:96-105``) — no 64-bit emulation in the hot path.

Base levels with σ^h ≤ cap are complete dense lists (no selection at all);
compaction only starts where the candidate space first exceeds the cap.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dense import NEG_INF

__all__ = ["enumerate_sparse", "enumerate_sparse_many",
           "enumerate_pairs_device", "merge_window_lists"]

#: fused-elementwise working-set budget for the combine (elements per chunk)
_CHUNK_ELEMS = 1 << 26


def _range_max(prefix: jnp.ndarray, start_rel: int, length: int,
               W: int) -> jnp.ndarray:
    return (jax.lax.dynamic_slice(prefix, (start_rel + length,), (W,))
            - jax.lax.dynamic_slice(prefix, (start_rel,), (W,)))


def _sort_desc(codes: jnp.ndarray, scores: jnp.ndarray):
    """Sort each row's (code, score) pairs by score descending (pruned -inf
    slots sink to the end). Values are untouched — only slot order changes."""
    neg, codes = jax.lax.sort_key_val(-scores, codes, dimension=-1)
    return codes, -neg


def _staircase_combine(cL, sL, cR, sR, eps, *, cap: int, shift):
    """Capacity-bounded pairwise combine without materializing the product.

    The TPU translation of DCLA's sorted early-termination
    (``pk_compute.cpp:61-110``): with both lists sorted score-descending,
    the surviving j for each i form a PREFIX (f32 addition is monotone), so
    the survivor region is a monotone staircase fully described by the
    per-i counts. Counts use the exact predicate ``fl(sL[i]+sR[j]) > eps``
    via a fused compare-reduce (CL-chunked); flat slot t is mapped back to
    its (i, j) with membership masks against the count cumsum and masked
    one-live-term sums (exact in f32, no gather/scatter/sort HLOs — those
    are far off speed-of-light on TPU at these shapes).

    cL/sL: [W, CL], cR/sR: [W, CR] (both sorted desc). Returns
    (codes, scores [W, C], overflow [W]) with C = min(cap, CL*CR); with
    ``shift=None`` codes is the pair (cL_sel, cR_sel) instead of a packed
    uint32. Output rows are NOT sorted; callers sort if needed.
    """
    W, CL = sL.shape
    CR = sR.shape[1]
    out_cap = min(cap, CL * CR)

    # exact per-i survivor counts (the staircase profile)
    cc = max(1, min(CL, _CHUNK_ELEMS // max(1, W * CR)))
    cnts = []
    for c0 in range(0, CL, cc):
        part = ((sL[:, c0:c0 + cc, None] + sR[:, None, :])
                > eps[:, None, None]).sum(axis=2, dtype=jnp.int32)
        cnts.append(part)
    cnt = jnp.concatenate(cnts, axis=1) if len(cnts) > 1 else cnts[0]
    offx = jnp.concatenate(
        [jnp.zeros((W, 1), jnp.int32),
         jnp.cumsum(cnt, axis=1, dtype=jnp.int32)], axis=1)   # [W, CL+1]
    total = offx[:, -1]
    overflow = total > out_cap

    jr = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CR), 2)

    tc = max(1, min(out_cap, _CHUNK_ELEMS // max(1, W * max(CL, CR))))
    out_cl, out_cr, out_s = [], [], []
    for t0 in range(0, out_cap, tc):
        t1 = min(out_cap, t0 + tc)
        ks = jnp.arange(t0, t1, dtype=jnp.int32)
        t = ks[None, :, None]                       # [1, T, 1]
        # triangular bound: cnt is non-increasing (both lists sorted desc),
        # so offx[i] >= i wherever cnt[i] >= 1; slot t's left row satisfies
        # offx[i] <= t, hence i <= t < t1 — and jj = t - offx[i] <= t too.
        il = min(CL, t1)
        jl = min(CR, t1)
        # membership: slot t lies in left-row i iff offx[i] <= t < offx[i+1]
        # (exactly one i for t < total, none otherwise)
        A = offx[:, None, :il + 1] <= t             # [W, T, il+1]
        M = A[..., :-1] & ~A[..., 1:]

        def pick_l(f, dt, M=M, il=il):
            # one live term per slot: the masked sum is exact in any dtype
            return jnp.where(M, f[:, None, :il], 0).sum(axis=2, dtype=dt)

        prev = pick_l(offx[:, :-1], jnp.int32)
        jj = ks[None, :] - prev
        N = jj[:, :, None] == jr[..., :jl]          # [W, T, jl]

        def pick_r(f, dt, N=N, jl=jl):
            return jnp.where(N, f[:, None, :jl], 0).sum(axis=2, dtype=dt)

        s = pick_l(sL, jnp.float32) + pick_r(sR, jnp.float32)
        valid = (ks[None, :] < total[:, None]) & (s > eps[:, None])
        out_s.append(jnp.where(valid, s, NEG_INF))
        out_cl.append(pick_l(cL, jnp.uint32))
        out_cr.append(pick_r(cR, jnp.uint32))

    cat = (lambda xs: jnp.concatenate(xs, axis=1) if len(xs) > 1 else xs[0])
    clg, crg, s = cat(out_cl), cat(out_cr), cat(out_s)
    if shift is None:
        return (clg, crg), s, overflow
    return (clg << np.uint32(shift)) | crg, s, overflow


def _span_lists(P: jnp.ndarray, prefix: jnp.ndarray, j: int, h: int,
                eps: jnp.ndarray, *, k: int, sigma: int, bits: int,
                cap: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Survivor lists for span (j, h) at every window offset.

    Returns (codes [W, C] uint32, scores [W, C], overflow [W] bool) with
    C ≤ cap, rows sorted score-descending; invalid slots have score -inf.
    Requires bits·h ≤ 32 (callers split at the top level first).
    """
    W = P.shape[0] - k + 1
    if h == 1:
        T = jax.lax.dynamic_slice(P, (j, 0), (W, sigma))
        scores = jnp.where(T > eps[:, None], T, NEG_INF)
        codes = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.uint32, (1, sigma), 1), (W, sigma))
        codes, scores = _sort_desc(codes, scores)
        return codes, scores, jnp.zeros((W,), dtype=bool)

    hl = h // 2
    hr = h - hl
    eps_l = eps - _range_max(prefix, j + hl, hr, W)
    eps_r = eps - _range_max(prefix, j, hl, W)
    cl, sl, ol = _span_lists(P, prefix, j, hl, eps_l, k=k, sigma=sigma,
                             bits=bits, cap=cap)
    cr, sr, orr = _span_lists(P, prefix, j + hl, hr, eps_r, k=k,
                              sigma=sigma, bits=bits, cap=cap)
    CL, CR = sl.shape[1], sr.shape[1]
    shift = bits * hr

    if CL * CR <= cap:
        # product fits the cap: materialize it whole (no selection at all)
        scores = (sl[:, :, None] + sr[:, None, :]).reshape(W, -1)
        scores = jnp.where(scores > eps[:, None], scores, NEG_INF)
        codes = ((cl[:, :, None] << np.uint32(shift)) | cr[:, None, :]
                 ).reshape(W, -1)
        overflow = ol | orr
    else:
        codes, scores, ovf = _staircase_combine(
            cl, sl, cr, sr, eps, cap=cap, shift=shift)
        overflow = ol | orr | ovf
    # keep every level's lists score-descending: the staircase prefix
    # property at the parent level requires sorted children
    codes, scores = _sort_desc(codes, scores)
    return codes, scores, overflow


def _top_pairs(P: jnp.ndarray, prefix: jnp.ndarray, log_threshold,
               *, k: int, sigma: int, bits: int, cap: int):
    """Full-window survivors for one ghost as (prefix, suffix) uint32 pairs.

    Returns (cl_sel [W, C], cr_sel [W, C], scores [W, C], overflow [])."""
    W = P.shape[0] - k + 1
    eps = jnp.full((W,), log_threshold, dtype=jnp.float32)
    if k == 1:
        cr, s, ovf = _span_lists(P, prefix, 0, 1, eps, k=k, sigma=sigma,
                                 bits=bits, cap=cap)
        return jnp.zeros_like(cr), cr, s, ovf.any()

    hl = k // 2
    hr = k - hl
    eps_l = eps - _range_max(prefix, hl, hr, W)
    eps_r = eps - _range_max(prefix, 0, hl, W)
    cl, sl, ol = _span_lists(P, prefix, 0, hl, eps_l, k=k, sigma=sigma,
                             bits=bits, cap=cap)
    cr, sr, orr = _span_lists(P, prefix, hl, hr, eps_r, k=k, sigma=sigma,
                              bits=bits, cap=cap)
    CL, CR = sl.shape[1], sr.shape[1]
    if CL * CR <= cap:
        scores = (sl[:, :, None] + sr[:, None, :]).reshape(W, -1)
        scores = jnp.where(scores > eps[:, None], scores, NEG_INF)
        clg = jnp.broadcast_to(cl[:, :, None], (W, CL, CR)).reshape(W, -1)
        crg = jnp.broadcast_to(cr[:, None, :], (W, CL, CR)).reshape(W, -1)
        overflow = ol | orr
    else:
        (clg, crg), scores, ovf = _staircase_combine(
            cl, sl, cr, sr, eps, cap=cap, shift=None)
        overflow = ol | orr | ovf
    return clg, crg, scores, overflow.any()


@functools.partial(jax.jit, static_argnames=("k", "sigma", "bits", "cap"))
def enumerate_pairs_device(P_all, prefix_all, log_threshold, *, k: int,
                           sigma: int, bits: int, cap: int):
    """Ghost-batched device enumeration: ONE dispatch for the whole batch.

    P_all: [G, S, sigma] f32, prefix_all: [G, S+1] f32. Returns device arrays
    (cl_sel, cr_sel [G, W, C] uint32, scores [G, W, C] f32, overflow [G])
    where a survivor's packed key is ``cl << (bits·(k - k//2)) | cr``
    (``pk_compute.cpp:96-105``). All arithmetic is f32/int32 — no 64-bit
    emulation on device."""
    def one(Pg, prefg):
        return _top_pairs(Pg, prefg, log_threshold, k=k, sigma=sigma,
                          bits=bits, cap=cap)

    return jax.vmap(one)(P_all, prefix_all)


def _pack_host(cl: np.ndarray, cr: np.ndarray, *, k: int, bits: int
               ) -> np.ndarray:
    shift = np.uint64(bits * (k - k // 2))
    return ((np.asarray(cl, dtype=np.uint64) << shift)
            | np.asarray(cr, dtype=np.uint64))


def enumerate_sparse_many(P_all, prefix_all, log_threshold, *, k: int,
                          sigma: int, bits: int, cap: int = 4096,
                          window_block: int | None = None,
                          combine_budget_bytes: int = 1 << 28):
    """Ghost-batched sparse enumeration (host-facing).

    P_all: [G, S, sigma], prefix_all: [G, S+1]. Returns
    (codes [G, W, C] uint64, scores [G, W, C] f32, overflow [G] bool).

    The device does everything in one dispatch per ghost chunk (chunk size
    bounded so working-set HBM stays within ``combine_budget_bytes``); the
    host only packs the returned uint32 pairs into uint64 keys.
    """
    P_all = np.asarray(P_all, dtype=np.float32)
    prefix_all = np.asarray(prefix_all, dtype=np.float32)
    G, S = P_all.shape[0], P_all.shape[1]
    W = S - k + 1
    if W <= 0 or G == 0:
        return (np.zeros((G, 0, 1), np.uint64),
                np.zeros((G, 0, 1), np.float32), np.zeros((G,), bool))
    # working set per ghost: a few [W, cap]-ish f32/u32 tensors per level
    per_ghost = W * min(cap, sigma ** ((k + 1) // 2)) * 8 * max(
        4, 2 * int(np.ceil(np.log2(max(2, k)))))
    ghost_chunk = max(1, min(G, combine_budget_bytes // max(1, per_ghost)))

    out_c, out_s = [], []
    overflow = np.zeros((G,), bool)
    for g0 in range(0, G, ghost_chunk):
        g1 = min(G, g0 + ghost_chunk)
        cl, cr, scores, ovf = enumerate_pairs_device(
            jnp.asarray(P_all[g0:g1]), jnp.asarray(prefix_all[g0:g1]),
            jnp.float32(log_threshold), k=k, sigma=sigma, bits=bits, cap=cap)
        out_c.append(_pack_host(cl, cr, k=k, bits=bits))
        out_s.append(np.asarray(scores, dtype=np.float32))
        overflow[g0:g1] = np.asarray(ovf)
    return np.concatenate(out_c), np.concatenate(out_s), overflow


def enumerate_sparse(P, prefix, log_threshold, *, k: int, sigma: int,
                     bits: int, cap: int = 4096,
                     window_block: int | None = None,
                     combine_budget_bytes: int = 1 << 28):
    """Full-window survivor lists for one ghost matrix.

    Returns (codes [W, C] uint64, scores [W, C] f32, overflow bool).
    """
    codes, scores, overflow = enumerate_sparse_many(
        np.asarray(P, dtype=np.float32)[None],
        np.asarray(prefix, dtype=np.float32)[None],
        log_threshold, k=k, sigma=sigma, bits=bits, cap=cap,
        window_block=window_block,
        combine_budget_bytes=combine_budget_bytes)
    return codes[0], scores[0], bool(overflow[0])


def merge_window_lists(codes: np.ndarray, scores: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side insert-or-max merge over windows (and ghosts, if their lists
    are concatenated along the window axis) — the hash-map ``put`` analog
    (``branch_group.cpp:88-102``) on compacted lists.

    codes/scores: [..., C] flattened; invalid slots (score -inf) are dropped.
    Returns (unique sorted codes, per-code max score).
    """
    codes = np.asarray(codes, dtype=np.uint64).ravel()
    scores = np.asarray(scores, dtype=np.float32).ravel()
    valid = np.isfinite(scores)
    codes, scores = codes[valid], scores[valid]
    if codes.size == 0:
        return codes, scores
    order = np.lexsort((-scores, codes))
    codes, scores = codes[order], scores[order]
    first = np.ones(len(codes), dtype=bool)
    first[1:] = codes[1:] != codes[:-1]
    # sorted by (code asc, score desc): the first row of each code group is
    # its maximum
    return codes[first], scores[first]
