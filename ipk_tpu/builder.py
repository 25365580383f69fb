"""Database build orchestrator: the TPU-native ``db_builder``.

Counterpart of ``ipk/src/db_builder.cpp`` (layer L3, SURVEY.md §1/§3). The
reference's three stages map as follows:

* stage 1 (``explore_kmers``/``explore_group``: per-branch windows → DCLA →
  hash maps) → one batched device computation:
  ``accumulate_ghosts`` + ``group_max`` over the dense [G, S, σ] posterior
  tensor, producing the dense per-branch accumulator A[B, σ^k]
  (see ``ipk_tpu.core.dense``).
* stage 2 (filtering, ``filter_in_ram``) → vectorized mif0/random filter over
  the accumulator + ascending sort (``ipk_tpu.core.filter``).
* stage 3 (serialization) → streaming ``.ipk`` writer in filter order
  (``ipk_tpu.serialize``).

Semantic invariants honored (SURVEY.md §7.1): strict ``score > (ω/σ)^k`` in
log10; per-(k-mer, branch) max over ghosts and windows; branch ids = original
postorder ids (root excluded); entry order per k-mer = group processing order
(first-ghost extended-postorder); DB sorted ascending by filter value.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from .seq import SeqTraits, dense_index_to_key
from .tree import PhyloTree
from .db import PhyloKmerDB
from .core import dense
from .core.filter import (mif0_filter_values, random_filter_values,
                          score_threshold, sort_order)
from .ar.mapping import gather_ghost_tensor, ghost_groups
from . import serialize

__all__ = ["build", "BuildResult", "log_threshold_f32", "extract_db_arrays"]


def log_threshold_f32(omega: float, sigma: int, k: int) -> np.float32:
    """log10((omega/sigma)^k) as f32 — the eps passed to the enumeration DP
    (``db_builder.cpp:640``)."""
    return np.float32(np.log10(score_threshold(omega, sigma, k)))


class BuildResult:
    def __init__(self, db: PhyloKmerDB, num_explored: int, timings: Dict[str, float]):
        self.db = db
        self.num_explored = num_explored
        self.timings = timings


def extract_db_arrays(A: np.ndarray, group_ids: List[int], k: int,
                      traits: SeqTraits, total_num_groups: int,
                      omega: float, filter_type: str = "mif0",
                      merge_branches: bool = False):
    """Dense accumulator → sorted DB arrays.

    A: [B, sigma^k] f32 (−inf where pruned); group_ids: original postorder id
    per accumulator row, in group processing order.
    Returns (keys, filter_values, offsets, branches, scores).
    """
    sigma = traits.alphabet_size
    mask = np.isfinite(A)

    if merge_branches:
        # keep only the best branch per k-mer (``--merge-branches``,
        # ``ipk.py:162-167``): one entry, max score over branches
        best_b = A.argmax(axis=0)
        best_mask = np.zeros_like(mask)
        cols_any = mask.any(axis=0)
        best_mask[best_b[cols_any], np.flatnonzero(cols_any)] = True
        mask = best_mask

    present = mask.any(axis=0)
    cols = np.flatnonzero(present)
    keys = dense_index_to_key(cols.astype(np.uint64), k, traits)

    # entries in (key-major, group-order) layout
    MT = mask[:, cols].T  # [Kp, B]
    key_rows, branch_rows = np.nonzero(MT)
    counts = MT.sum(axis=1)
    offsets = np.zeros(len(cols) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    branch_ids = np.asarray(group_ids, dtype=np.uint32)[branch_rows]
    scores = A[branch_rows, cols[key_rows]].astype(np.float32)

    threshold = score_threshold(omega, sigma, k)
    if filter_type == "mif0":
        fv_all = mif0_filter_values(A, mask, total_num_groups, threshold)
        fv = fv_all[cols]
    elif filter_type == "random":
        # assigned in ascending-key order (documented deviation: the
        # reference uses hash-map iteration order, filter.cpp:140)
        fv = random_filter_values(len(cols)).astype(np.float64)
    else:
        raise RuntimeError("Error: Unsupported filter type.")

    order = sort_order(fv, keys)

    # reorder keys and entry ranges by filter order
    new_keys = keys[order]
    new_fv = fv[order].astype(np.float32)
    new_counts = counts[order]
    new_offsets = np.zeros(len(cols) + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offsets[1:])
    gather = np.concatenate(
        [np.arange(offsets[i], offsets[i + 1]) for i in order]
    ) if len(order) else np.zeros(0, dtype=np.int64)
    return (new_keys, new_fv, new_offsets,
            branch_ids[gather], scores[gather])


def build(original_tree: PhyloTree,
          extended_tree: PhyloTree,
          ghost_mapping: Dict[str, int],
          ar_mapping: Dict[str, str],
          label_rows: Dict[str, int],
          P: np.ndarray,
          *,
          traits: SeqTraits,
          kmer_size: int,
          omega: float,
          filter_type: str = "mif0",
          ghost_strategy: str = "both",
          merge_branches: bool = False,
          output_filename: Optional[str] = None,
          uncompressed: bool = False,
          on_device: bool = True,
          block_w: int = 32,
          verbose: int = 1) -> BuildResult:
    """Run the full stage-1..3 build (cf. ``db_builder::run``,
    ``db_builder.cpp:182-218``)."""
    sigma = traits.alphabet_size
    if kmer_size > traits.max_kmer_length:
        raise RuntimeError(
            f"Maximum k-mer size allowed: {traits.max_kmer_length}")
    timings: Dict[str, float] = {}

    if verbose > 0:
        print("Computation parameters:")
        print(f"\tsequence type: {traits.name}")
        print(f"\tk: {kmer_size}")
        print(f"\tomega: {omega}\n")

    from .tree import to_newick
    db = PhyloKmerDB(kmer_size, omega, traits.name,
                     to_newick(original_tree),
                     original_tree.tree_index())

    # ---- stage 1: dense enumeration --------------------------------------
    t0 = time.monotonic()
    groups, group_ids = ghost_groups(extended_tree, original_tree,
                                     ghost_mapping, ghost_strategy)
    P_all = gather_ghost_tensor(groups, ar_mapping, label_rows, P)
    prefix_all = dense.best_score_prefix(P_all)
    eps = log_threshold_f32(omega, sigma, kmer_size)
    A_ghost = dense.accumulate_ghosts(
        np.asarray(P_all, dtype=np.float32), prefix_all, eps,
        k=kmer_size, sigma=sigma, block_w=block_w)
    A = np.asarray(dense.group_max(A_ghost, len(groups[0]) if groups else 1))
    timings["computation"] = time.monotonic() - t0
    if verbose > 0:
        print(f"Computation time: {timings['computation']*1e3:.0f} ms")

    # ---- stage 2: filter + sort ------------------------------------------
    t0 = time.monotonic()
    keys, fv, offsets, branches, scores = extract_db_arrays(
        A, group_ids, kmer_size, traits,
        total_num_groups=original_tree.get_node_count(),
        omega=omega, filter_type=filter_type, merge_branches=merge_branches)
    db.set_data(keys, fv, offsets, branches, scores)
    timings["filtering"] = time.monotonic() - t0
    if verbose > 0:
        print(f"Filtering time: {timings['filtering']*1e3:.0f} ms")

    # ---- stage 3: serialize ----------------------------------------------
    t0 = time.monotonic()
    if output_filename:
        serialize.save(db, output_filename, compressed=not uncompressed)
    timings["merge"] = time.monotonic() - t0
    if verbose > 0:
        print(f"Merge time: {timings['merge']*1e3:.0f} ms")
        print("Building database: Done.")
        if output_filename:
            print(f"Output: {output_filename}")

    num_explored = int(np.isfinite(A).sum())
    return BuildResult(db, num_explored, timings)
