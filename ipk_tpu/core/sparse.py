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
(f32 addition is monotone) — count them with one vectorized compare, then
extract by offset arithmetic. This is the vectorized equivalent of DCLA's
sort-the-smaller-side + early-break pairwise loop (``pk_compute.cpp:61-110``)
and avoids the O(CL*CR log) top_k the naive compaction needs.
Because every true survivor has score > eps and pruned slots are -inf, the
survivor *set* is exactly the reference's whenever the count fits the cap;
an overflow flag is returned per window so callers can fail loudly and retry
with a larger cap (silent truncation would drop valid k-mers). Scores follow
the identical f32 summation tree, so values are bit-equal to the dense path.

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

__all__ = ["sparse_span_lists", "enumerate_sparse", "enumerate_sparse_many",
           "merge_window_lists"]


def _range_max(prefix: jnp.ndarray, start_rel: int, length: int,
               W: int) -> jnp.ndarray:
    return (jax.lax.dynamic_slice(prefix, (start_rel + length,), (W,))
            - jax.lax.dynamic_slice(prefix, (start_rel,), (W,)))


def _sort_desc(codes: jnp.ndarray, scores: jnp.ndarray):
    """Sort each row's (code, score) pairs by score descending (pruned -inf
    slots sink to the end). Values are untouched — only slot order changes."""
    neg, codes = jax.lax.sort_key_val(-scores, codes, dimension=-1)
    return codes, -neg


def _staircase_combine(cL, sL, cR, sR, eps, *, cap: int, shift: int,
                       chunk_elems: int = 1 << 24):
    """Capacity-bounded pairwise combine without sorting the product.

    The TPU translation of DCLA's sorted early-termination
    (``pk_compute.cpp:61-110``): with sR sorted descending, the surviving j
    for each i form a PREFIX (f32 addition is monotone), so the survivor set
    is a staircase region. Count it with exact f32 sums (one vectorized
    compare over [CL, CR] — no materialized product kept, no O(n log n)
    top_k over CL*CR), then extract survivor t as (i, j) via a searchsorted
    on the row-offset cumsum — O(cap log CL) integer gathers.

    cL/sL: [W, CL], cR/sR: [W, CR] (sR desc). Returns
    (codes [W, C], scores [W, C], overflow [W]) with C = min(cap, CL*CR);
    scores are the true f32 sums sL[i] + sR[j] (reference summation tree).
    Output rows are NOT sorted; callers sort once (C-wide) if needed.
    """
    W, CL = sL.shape
    CR = sR.shape[1]
    out_cap = min(cap, CL * CR)
    cc = max(1, min(CL, chunk_elems // max(1, W * CR)))
    cnts = []
    for c0 in range(0, CL, cc):
        T = sL[:, c0:c0 + cc, None] + sR[:, None, :]
        cnts.append((T > eps[:, None, None]).sum(axis=2, dtype=jnp.int32))
    cnt = jnp.concatenate(cnts, axis=1)                       # [W, CL]
    offx = jnp.concatenate(
        [jnp.zeros((W, 1), jnp.int32),
         jnp.cumsum(cnt, axis=1, dtype=jnp.int32)], axis=1)   # [W, CL+1]
    total = offx[:, -1]
    overflow = total > out_cap
    ks = jnp.arange(out_cap, dtype=jnp.int32)
    i = jax.vmap(
        lambda o: jnp.searchsorted(o, ks, side="right"))(offx[:, 1:])
    i = jnp.minimum(i, CL - 1).astype(jnp.int32)
    prev = jnp.take_along_axis(offx, i, axis=1)
    jj = jnp.clip(ks[None, :] - prev, 0, CR - 1).astype(jnp.int32)
    s = (jnp.take_along_axis(sL, i, axis=1)
         + jnp.take_along_axis(sR, jj, axis=1))
    valid = ks[None, :] < total[:, None]
    s = jnp.where(valid, s, NEG_INF)
    c = ((jnp.take_along_axis(cL, i, axis=1) << np.uint64(shift))
         | jnp.take_along_axis(cR, jj, axis=1))
    return c, s, overflow


def sparse_span_lists(P: jnp.ndarray, prefix: jnp.ndarray, j: int, h: int,
                      eps: jnp.ndarray, *, k: int, sigma: int, bits: int,
                      cap: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Survivor lists for span (j, h) at every window offset.

    Returns (codes [W, C], scores [W, C], overflow [W] bool) with C ≤ cap;
    invalid slots have score -inf (their codes are arbitrary). Codes are
    bit-packed with the reference's strides (``pk_compute.cpp:96-105``).
    """
    W = P.shape[0] - k + 1
    if h == 1:
        T = jax.lax.dynamic_slice(P, (j, 0), (W, sigma))
        scores = jnp.where(T > eps[:, None], T, NEG_INF)
        codes = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.uint64, (1, sigma), 1), (W, sigma))
        codes, scores = _sort_desc(codes, scores)
        return codes, scores, jnp.zeros((W,), dtype=bool)

    hl = h // 2
    hr = h - hl
    eps_l = eps - _range_max(prefix, j + hl, hr, W)
    eps_r = eps - _range_max(prefix, j, hl, W)
    cl, sl, ol = sparse_span_lists(P, prefix, j, hl, eps_l, k=k, sigma=sigma,
                                   bits=bits, cap=cap)
    cr, sr, orr = sparse_span_lists(P, prefix, j + hl, hr, eps_r, k=k,
                                    sigma=sigma, bits=bits, cap=cap)
    CL, CR = sl.shape[1], sr.shape[1]
    shift = bits * hr

    if CL * CR <= cap:
        # product fits the cap: materialize it whole (no selection at all)
        scores = (sl[:, :, None] + sr[:, None, :]).reshape(W, -1)
        scores = jnp.where(scores > eps[:, None], scores, NEG_INF)
        codes = ((cl[:, :, None] << np.uint64(shift)) | cr[:, None, :]
                 ).reshape(W, -1)
        overflow = ol | orr
    else:
        codes, scores, ovf = _staircase_combine(
            cl, sl, cr, sr, eps, cap=cap, shift=shift)
        overflow = ol | orr | ovf
    # keep every level's lists score-descending: the staircase prefix
    # property at the parent level requires a sorted right child
    codes, scores = _sort_desc(codes, scores)
    return codes, scores, overflow


@functools.partial(jax.jit,
                   static_argnames=("k", "sigma", "bits", "cap"))
def _enumerate_sparse_jit(P, prefix, log_threshold, *, k, sigma, bits, cap):
    W = P.shape[0] - k + 1
    eps_top = jnp.full((W,), log_threshold, dtype=jnp.float32)
    codes, scores, overflow = sparse_span_lists(
        P, prefix, 0, k, eps_top, k=k, sigma=sigma, bits=bits, cap=cap)
    return codes, scores, overflow.any()


def enumerate_sparse(P, prefix, log_threshold, *, k: int, sigma: int,
                     bits: int, cap: int = 4096,
                     window_block: int | None = None,
                     combine_budget_bytes: int = 1 << 28):
    """Full-window survivor lists for one ghost matrix.

    Returns (codes [W, C] uint64, scores [W, C] f32, overflow bool).
    Runs under scoped x64 so packed codes keep 64 bits (k up to 31 DNA needs
    62; the global default truncates uint64 to uint32). All score arithmetic
    is explicitly f32 and unaffected.

    Windows are processed in blocks so the top-level [block, Cl*Cr] combine
    stays within ``combine_budget_bytes`` of HBM.
    """
    P = np.asarray(P, dtype=np.float32)
    prefix = np.asarray(prefix, dtype=np.float32)
    S = P.shape[0]
    W = S - k + 1
    if W <= 0:
        return (np.zeros((0, 1), np.uint64), np.zeros((0, 1), np.float32),
                False)
    hl = k // 2
    cl = min(cap, sigma ** hl)
    cr = min(cap, sigma ** (k - hl))
    if window_block is None:
        window_block = max(1, combine_budget_bytes // max(1, cl * cr * 4))
    window_block = min(window_block, W)

    out_c, out_s = [], []
    overflow = False
    with jax.enable_x64():
        for w0 in range(0, W, window_block):
            bw = min(window_block, W - w0)
            # windows [w0, w0+bw) need columns [w0, w0+bw+k-1); prefix is
            # sliced consistently (only differences are used)
            Pb = jnp.asarray(P[w0:w0 + bw + k - 1])
            prefb = jnp.asarray(prefix[w0:w0 + bw + k - 1 + 1])
            codes, scores, ovf = _enumerate_sparse_jit(
                Pb, prefb, jnp.float32(log_threshold), k=k, sigma=sigma,
                bits=bits, cap=cap)
            out_c.append(np.asarray(codes, dtype=np.uint64))
            out_s.append(np.asarray(scores, dtype=np.float32))
            overflow = overflow or bool(ovf)
    width = max(c.shape[1] for c in out_c)
    if any(c.shape[1] != width for c in out_c):  # ragged tail (cap vs full)
        out_c = [np.pad(c, ((0, 0), (0, width - c.shape[1]))) for c in out_c]
        out_s = [np.pad(s, ((0, 0), (0, width - s.shape[1])),
                        constant_values=NEG_INF) for s in out_s]
    return np.concatenate(out_c), np.concatenate(out_s), overflow


@functools.partial(jax.jit,
                   static_argnames=("k", "sigma", "bits", "cap"))
def _enumerate_sparse_batch_jit(P, prefix, log_threshold, *, k, sigma, bits,
                                cap):
    def one(Pg, prefg):
        W = Pg.shape[0] - k + 1
        eps_top = jnp.full((W,), log_threshold, dtype=jnp.float32)
        codes, scores, overflow = sparse_span_lists(
            Pg, prefg, 0, k, eps_top, k=k, sigma=sigma, bits=bits, cap=cap)
        return codes, scores, overflow.any()

    return jax.vmap(one)(P, prefix)


def enumerate_sparse_many(P_all, prefix_all, log_threshold, *, k: int,
                          sigma: int, bits: int, cap: int = 4096,
                          window_block: int | None = None,
                          combine_budget_bytes: int = 1 << 28):
    """Ghost-batched :func:`enumerate_sparse`.

    P_all: [G, S, sigma], prefix_all: [G, S+1]. Returns
    (codes [G, W, C] uint64, scores [G, W, C] f32, overflow [G] bool).

    One device dispatch + host transfer per *window block across all
    ghosts* instead of per (ghost, block) — the per-ghost loop pays the
    host round-trip G times, which dominates on remote-tunnel platforms.
    The combine budget bounds G * block * Cl * Cr * 4 bytes of HBM.
    """
    P_all = np.asarray(P_all, dtype=np.float32)
    prefix_all = np.asarray(prefix_all, dtype=np.float32)
    G, S = P_all.shape[0], P_all.shape[1]
    W = S - k + 1
    if W <= 0 or G == 0:
        return (np.zeros((G, 0, 1), np.uint64),
                np.zeros((G, 0, 1), np.float32), np.zeros((G,), bool))
    hl = k // 2
    cl = min(cap, sigma ** hl)
    cr = min(cap, sigma ** (k - hl))
    if window_block is None:
        window_block = max(1, combine_budget_bytes
                           // max(1, G * cl * cr * 4))
    window_block = min(window_block, W)

    out_c, out_s = [], []
    overflow = np.zeros((G,), bool)
    with jax.enable_x64():
        for w0 in range(0, W, window_block):
            bw = min(window_block, W - w0)
            Pb = jnp.asarray(P_all[:, w0:w0 + bw + k - 1])
            prefb = jnp.asarray(prefix_all[:, w0:w0 + bw + k - 1 + 1])
            codes, scores, ovf = _enumerate_sparse_batch_jit(
                Pb, prefb, jnp.float32(log_threshold), k=k, sigma=sigma,
                bits=bits, cap=cap)
            out_c.append(np.asarray(codes, dtype=np.uint64))
            out_s.append(np.asarray(scores, dtype=np.float32))
            overflow |= np.asarray(ovf)
    width = max(c.shape[2] for c in out_c)
    if any(c.shape[2] != width for c in out_c):  # ragged tail (cap vs full)
        out_c = [np.pad(c, ((0, 0), (0, 0), (0, width - c.shape[2])))
                 for c in out_c]
        out_s = [np.pad(s, ((0, 0), (0, 0), (0, width - s.shape[2])),
                        constant_values=NEG_INF) for s in out_s]
    return np.concatenate(out_c, axis=1), np.concatenate(out_s, axis=1), \
        overflow


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
