"""Single-core C++ DCLA baseline measurement protocol.

Shared by ``bench.py`` and ``benchmarks/suite.py`` so every reported speedup
uses the same defensible methodology (VERDICT r2 item 5):

* the oracle binary is pinned to one core (``taskset -c``) when available, so
  shared-CPU load does not migrate it mid-run;
* every rate is the MEDIAN of ``reps`` (default 5) repeated runs, and the raw
  samples are recorded next to the median in the results artifact;
* the cache digest includes a host fingerprint (CPU model + core count) and
  the sha256 of the compiled binary, so a committed cache can never leak one
  machine's rate onto another (ADVICE r2 item 1).

The binary itself is the clean-room DCLA oracle (``native/baseline_dcla.cpp``,
mirroring the reference's stage-1 ``db_builder.cpp:220-237`` enumeration +
insert-or-max merge); the reference binary cannot be built here (gaps G1/G3).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import statistics
import struct
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARY = os.path.join(REPO, "native", "baseline_dcla")
SOURCE = BINARY + ".cpp"


def ensure_binary() -> str:
    if (not os.path.exists(BINARY)
            or os.path.getmtime(BINARY) < os.path.getmtime(SOURCE)):
        subprocess.run(["g++", "-O3", "-march=native", "-o", BINARY, SOURCE],
                       check=True)
    return BINARY


def host_fingerprint() -> str:
    model = "unknown-cpu"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return f"{model}/{os.cpu_count()}"


def _binary_hash() -> str:
    with open(ensure_binary(), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _pin_prefix() -> list:
    if shutil.which("taskset"):
        return ["taskset", "-c", "0"]
    return []


def run_oracle(P_sub, k: int, sigma: int, eps, *, pin: bool = True) -> dict:
    """One pinned oracle run. Returns the oracle's JSON ({tuples, ms, ...})."""
    header = struct.pack("<qqqqfq", P_sub.shape[0], P_sub.shape[1], sigma, k,
                         float(eps), 0)
    argv = (_pin_prefix() if pin else []) + [ensure_binary()]
    result = subprocess.run(argv, input=header + P_sub.tobytes(),
                            capture_output=True, check=True)
    return json.loads(result.stdout)


def measure_rate(P_sub, k: int, sigma: int, eps, *, reps: int = 5,
                 pin: bool = True) -> dict:
    """Median single-core tuples/s over ``reps`` pinned runs.

    Returns {"rate": median, "samples": [rates...], "tuples": n,
    "pinned": bool, "host": fingerprint}. The relative spread of the samples
    quantifies the run-to-run noise band for this measurement (replacing
    BASELINE.md r2's unquantified "±2x" caveat).
    """
    samples = []
    raw = None
    for _ in range(reps):
        raw = run_oracle(P_sub, k, sigma, eps, pin=pin)
        samples.append(raw["tuples"] / (raw["ms"] / 1e3))
    rate = statistics.median(samples)
    spread = (max(samples) - min(samples)) / rate if rate else 0.0
    return {"rate": rate, "samples": samples, "tuples": raw["tuples"],
            "raw": raw, "pinned": bool(_pin_prefix()) and pin,
            "host": host_fingerprint(), "spread": spread}


def cache_digest(workload_digest: str) -> str:
    """Digest binding a cached rate to workload + host + binary."""
    return f"{workload_digest}|{host_fingerprint()}|{_binary_hash()}"
