#!/usr/bin/env python3
"""Breakdown profiling of the AA sparse configs (VERDICT r2 item 1).

Times each piece of the sparse path separately on the real device:
  - probe_caps (host)
  - the full production dispatch (enumerate_pairs_deferred)
  - the per-span staircase kernels in isolation
  - the _sort_desc calls in isolation
to find where the 11-24 us/window goes.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from ipk_tpu.core import dense, sparse as sparse_mod
from ipk_tpu.core.pallas_kernels import staircase_select_wide
from benchmarks.suite import make_P, make_P_peaked


def timeit(fn, n=8, reps=3):
    fn()  # compile
    best = 1e18
    for _ in range(reps):
        t0 = time.monotonic()
        outs = [fn() for _ in range(n)]
        jax.block_until_ready(outs[-1])
        best = min(best, (time.monotonic() - t0) / n)
    return best


def profile_config(name, P_all, k, sigma, bits, eps, cap):
    G, S = P_all.shape[:2]
    W = S - k + 1
    print(f"\n=== {name}: G={G} S={S} W={W} k={k} sigma={sigma} "
          f"windows={G*W} ===")
    prefix_all = dense.best_score_prefix(P_all)

    t0 = time.monotonic()
    caps = sparse_mod.probe_caps(P_all, prefix_all, eps, k=k, sigma=sigma,
                                 cap=cap)
    t_probe = time.monotonic() - t0
    print(f"probe_caps: {t_probe*1e3:.1f} ms, caps={caps}")

    P_dev = jax.device_put(P_all)
    pre_dev = jax.device_put(prefix_all)

    # settle caps like the bench does
    _, _, s, ovf = sparse_mod.enumerate_pairs_device(
        P_dev, pre_dev, np.float32(eps), k=k, sigma=sigma, bits=bits,
        cap=cap, caps=caps)
    caps = sparse_mod.normalize_caps(caps, k, sigma, cap)
    tuples = int(np.asarray(jnp.isfinite(s).sum()))
    print(f"tuples={tuples} ({tuples/(G*W):.0f}/window)")

    def full():
        return sparse_mod.enumerate_pairs_deferred(
            P_dev, pre_dev, np.float32(eps), k=k, sigma=sigma, bits=bits,
            caps=caps)[1][2]

    t_full = timeit(full)
    print(f"full dispatch: {t_full*1e3:.2f} ms "
          f"({t_full/(G*W)*1e6:.2f} us/window) "
          f"-> {tuples/t_full/1e6:.1f} M tuples/s")

    # per-span staircase isolation: reproduce the span structure
    spans = sparse_mod._spans(k)
    caps_full = dict(caps)
    # figure out each staircase's CL/CR from the split tree
    sizes = {}
    for (j, h) in sparse_mod.split_tree(k):
        if h == 1:
            sizes[(j, h)] = sigma
        else:
            hl = h // 2
            cl = sizes[(j, hl)]
            cr = sizes[(j + hl, h - hl)]
            nat = cl * cr
            c = caps_full.get((j, h), nat)
            sizes[(j, h)] = min(nat, c)
            kind = ("complete" if cl * cr <= c else "staircase")
            print(f"  span {(j,h)}: CL={cl} CR={cr} out={sizes[(j,h)]} "
                  f"{kind}")

    rng = np.random.default_rng(0)
    for (j, h) in spans:
        hl = h // 2
        cl_n = sizes[(j, hl)]
        cr_n = sizes[(j + hl, h - hl)]
        out_cap = caps_full.get((j, h), cl_n * cr_n)
        if cl_n * cr_n <= out_cap:
            continue  # complete product, not a kernel call
        CL, CR = cl_n, cr_n
        sL = jnp.asarray(rng.uniform(-9, 0, (G, W, CL)).astype(np.float32))
        sR = jnp.asarray(np.sort(rng.uniform(-9, 0, (G, W, CR)).astype(
            np.float32), axis=2)[:, :, ::-1].copy())
        cL = jnp.zeros((G, W, CL), jnp.uint32)
        cR = jnp.zeros((G, W, CR), jnp.uint32)
        epsw = jnp.asarray(rng.uniform(-8, -7, (G, W)).astype(np.float32))

        def kern(sL=sL, cL=cL, sR=sR, cR=cR, epsw=epsw, out_cap=out_cap):
            return staircase_select_wide(sL, cL, sR, cR, epsw,
                                         cap=out_cap)[2]

        t_k = timeit(kern)
        print(f"  staircase {(j,h)} CL={CL} CR={CR} cap={out_cap}: "
              f"{t_k*1e3:.2f} ms ({t_k/(G*W)*1e6:.2f} us/window)")

        def srt(sR=sR, cR=cR):
            return sparse_mod._sort_desc(cR, sR)[1]

        t_s = timeit(srt)
        print(f"  sort_desc CR={CR}: {t_s*1e3:.2f} ms "
              f"({t_s/(G*W)*1e6:.2f} us/window)")


def main():
    rng = np.random.default_rng(7)
    omega, k, sigma_aa = 4.0, 6, 20
    eps = np.float32(np.log10((omega / sigma_aa) ** k))
    P = make_P(rng, 32, 200, sigma_aa)
    profile_config("aa_k6", P, k, sigma_aa, 5, eps, 4096)

    omega, k = 8.0, 8
    eps = np.float32(np.log10((omega / sigma_aa) ** k))
    P = make_P_peaked(rng, 64, 100, sigma_aa)
    profile_config("aa_k8", P, k, sigma_aa, 5, eps, 512)


if __name__ == "__main__":
    main()
