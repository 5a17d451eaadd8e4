"""Host roofline probes backing BENCH/BASELINE.md's scaling analysis.

Measures the sandbox HOST (no Spark, no engine code except the codec
kernels) at two pinned core counts, so engine scaling can be separated
from host-hardware ceilings:

  triad    DRAM-resident STREAM-style a = b + 3c in independent
           processes → aggregate memory bandwidth per level
  alu      L1-resident multiply-sum (no DRAM traffic) → pure
           clock/scheduling ceiling for embarrassingly parallel work
  kernel   the actual Gorilla/DoD + LOCF-fill block kernel in
           independent processes (no Spark) → kernel-only scaling

Run:  python jobs/host_roofline.py [lo] [hi]     (defaults 8 32)
Each level re-executes this script under `taskset -c 0-(n-1)`.
Prints one JSON line with per-level numbers and ratios.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _triad(seed: int) -> float:
    n = 8_000_000  # 3 × 64 MB arrays — DRAM-resident
    a = np.empty(n)
    b = np.full(n, 1.5)
    c = np.full(n, 2.5)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        np.multiply(c, 3.0, out=a)
        a += b
    return reps * 3 * n * 8 / (time.perf_counter() - t0)  # bytes/sec


def _alu(seed: int) -> float:
    rng = np.random.default_rng(seed)
    a = rng.standard_normal(4096)  # 32 KB — L1-resident
    t0 = time.perf_counter()
    reps = 3000
    s = 0.0
    for _ in range(reps):
        s += float((a * a).sum())
    return reps / (time.perf_counter() - t0)  # iterations/sec


def _kernel(seed: int) -> float:
    """The engine's ACTUAL value-encode kernel — run-aware and batched
    across blocks exactly like encode.py's flush (one
    gorilla_encode_runs_blocks call per 64-block batch, ~68 runs/block
    like the bench workload) — in bare processes, no Spark."""
    from sfa_spark.codecs import dod_encode_dense, gorilla_encode_runs_blocks

    rng = np.random.default_rng(seed)
    nblocks, runs_per, n = 64, 68, 4096
    bounds = np.arange(nblocks + 1, dtype=np.int64) * runs_per
    rl = np.full(nblocks * runs_per, n // runs_per, dtype=np.int64)
    rl[runs_per - 1 :: runs_per] += n - runs_per * (n // runs_per)
    pts = 0
    t0 = time.perf_counter()
    for _ in range(800):
        rv = rng.standard_normal(nblocks * runs_per)
        for b in range(nblocks):
            dod_encode_dense(0, 60_000_000, n)
        gorilla_encode_runs_blocks(rv, rl, bounds)
        pts += nblocks * n
    return pts / (time.perf_counter() - t0)  # points/sec


_PROBES = {"triad": _triad, "alu": _alu, "kernel": _kernel}


def run_level(nproc: int) -> dict:
    out = {}
    for name, fn in _PROBES.items():
        with Pool(nproc) as p:
            p.map(fn, range(4))  # warm
            rates = p.map(fn, range(100, 100 + nproc))
        out[name] = sum(rates)
    return out


def main() -> None:
    if "--level" in sys.argv:
        n = int(sys.argv[sys.argv.index("--level") + 1])
        print(json.dumps(run_level(n)))
        return
    args = [a for a in sys.argv[1:] if a != "--save"]
    levels = [int(a) for a in args] or [2, 8, 32]
    # the sandbox VM has noisy hypervisor neighbors — interleave levels
    # over several rounds and keep each probe's best rate per level
    res: dict[int, dict] = {}
    for _round in range(3):
        for n in levels:
            p = subprocess.run(
                ["taskset", "-c", f"0-{n - 1}", sys.executable,
                 os.path.abspath(__file__), "--level", str(n)],
                capture_output=True, text=True,
            )
            r = json.loads(p.stdout.strip().splitlines()[-1])
            if n not in res:
                res[n] = r
            else:
                res[n] = {k: max(res[n][k], r[k]) for k in r}
    report: dict = {"levels": levels}
    for name in _PROBES:
        report[name] = {str(n): res[n][name] for n in levels}
        for a, b in zip(levels, levels[1:]):
            report[name][f"eff_{a}to{b}"] = round(
                (res[b][name] / res[a][name]) / (b / a), 3
            )
    if "--save" in sys.argv:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/roofline.json", "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
