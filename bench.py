#!/usr/bin/env python3
"""Benchmark: k-mers scored per second on the dense TPU enumeration path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R}

Metric definition follows the reference's stage-1 instrumentation
(``db_builder.cpp:230-237``: elapsed time + explored-tuple counter): tuples =
surviving (window, k-mer) pairs across all ghost matrices; rate = tuples /
stage-1 wall time. The baseline is the locally measured single-core rate of
``native/baseline_dcla.cpp`` (a clean-room implementation of the reference's
DCLA algorithm — the reference binary itself cannot be built here, see
BASELINE.md) on the same inputs.

Workload: DNA k=8, omega=1.5, 256 branches (512 ghost matrices), 300 sites —
the scale of BASELINE.json config 1/2.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

K = 8
SIGMA = 4
OMEGA = 1.5
NUM_GROUPS = 256
S = 300
BASELINE_GHOSTS = 8   # measure single-core *rate* on a subset, it is constant
CACHE = os.path.join(REPO, "benchmarks", "baseline_cache.json")


def make_workload(seed=7):
    rng = np.random.default_rng(seed)
    G = 2 * NUM_GROUPS
    p = rng.dirichlet(np.ones(SIGMA) * 0.4, size=(G, S)).astype(np.float32)
    P = np.log10(np.maximum(p, 1e-30)).astype(np.float32)
    return P


def run_tpu(P_all, pipeline=8):
    """Stage-1 throughput on the fused Pallas path (halves + VMEM-resident
    transpose-chunked combine/max kernel).

    ``pipeline`` stage-1 iterations are dispatched back-to-back and timed
    through the host transfer of the final iteration's counts (the tunnel
    platform's block_until_ready is not a reliable completion barrier, so a
    transfer is the only sound barrier; pipelining amortizes its ~28 ms
    round-trip the same way a real build amortizes it across branch batches).
    """
    import functools
    from ipk_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from ipk_tpu.core import dense
    from ipk_tpu.core.pallas_kernels import combine_max

    prefix_all = dense.best_score_prefix(P_all)
    eps = np.float32(np.log10((OMEGA / SIGMA) ** K))
    halves = jax.jit(jax.vmap(
        functools.partial(dense.masked_halves, k=K, sigma=SIGMA),
        in_axes=(0, 0, None)))

    def stage1(P_dev, pre_dev):
        L, R = halves(P_dev, pre_dev, eps)
        A, counts = combine_max(L, R, eps, block_w=64, with_count=True,
                                interpret=False)
        return A, counts

    P_dev = jax.device_put(P_all)
    pre_dev = jax.device_put(prefix_all)
    _, counts = stage1(P_dev, pre_dev)  # warmup/compile
    tuples_once = int(np.asarray(counts).astype(np.int64).sum())
    best = 1e18
    for _ in range(3):
        t0 = time.monotonic()
        for _ in range(pipeline):
            _, counts = stage1(P_dev, pre_dev)
        np.asarray(counts)
        best = min(best, time.monotonic() - t0)
    return tuples_once * pipeline, best


def run_baseline(P_all):
    """Single-core tuples/sec of the clean-room C++ DCLA on a ghost subset.

    Measured with the pinned-median protocol of ``benchmarks/baseline.py``
    (taskset to core 0, median of 5 runs, raw samples cached). The cache
    digest binds the rate to this host's CPU and the exact compiled binary,
    so a stale or foreign cache is never reused."""
    sys.path.insert(0, REPO)
    from benchmarks import baseline as bl

    digest = bl.cache_digest(
        f"{K}-{SIGMA}-{OMEGA}-{NUM_GROUPS}-{S}-{BASELINE_GHOSTS}-v3")
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
        if cached.get("digest") == digest:
            return cached["rate"]

    sub = P_all[:BASELINE_GHOSTS]
    eps = np.float32(np.log10((OMEGA / SIGMA) ** K))
    meas = bl.measure_rate(sub, K, SIGMA, eps, reps=5)
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    with open(CACHE, "w") as f:
        json.dump({"digest": digest, "rate": meas["rate"], "meas": meas}, f)
    return meas["rate"]


def main():
    sys.path.insert(0, REPO)
    from ipk_tpu.utils.malloc_tune import retain_heap
    retain_heap()
    P_all = make_workload()
    baseline_rate = run_baseline(P_all)
    tuples, elapsed = run_tpu(P_all)
    rate = tuples / elapsed
    print(json.dumps({
        "metric": "kmers_scored_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "tuples/s",
        "vs_baseline": round(rate / baseline_rate, 2),
    }))


if __name__ == "__main__":
    main()
