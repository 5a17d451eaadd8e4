"""Profile the fused gap-fill + Gorilla-encode stage at a pinned core
count, splitting wall time into python-worker CPU, JVM CPU and idle —
and sweep the Spark knobs the round-2 verdict asked about
(arrow.maxRecordsPerBatch, shuffle compression codec).

Usage (the caller pins the process tree, exactly like bench.py
--scaling does):

    taskset -c 0-31 python jobs/encode_profile.py --cores 32 \
        --input /path/to/t1m.parquet [--arrow-batch 65536]
        [--codec zstd] [--json]

Prints one JSON line: {wall, points, pts_per_sec, py_cpu, jvm_cpu,
cpu_capacity, py_share, jvm_share, idle_share, conf:{...}}.

CPU accounting: sum utime+stime over every descendant of this process
(JVM, python daemons/workers) from /proc/<pid>/stat, sampled right
before and right after the timed run — workers are reused across jobs,
so none exit mid-measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLK = os.sysconf("SC_CLK_TCK")


def _descendants(root_pid: int) -> list[int]:
    kids: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
        except (OSError, IndexError, ValueError):
            continue
        kids.setdefault(ppid, []).append(int(pid))
    out, stack = [], [root_pid]
    while stack:
        p = stack.pop()
        for c in kids.get(p, []):
            out.append(c)
            stack.append(c)
    return out


def _cpu_seconds(pids: list[int]) -> dict[int, tuple[float, str]]:
    out = {}
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as f:
                raw = f.read()
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            parts = raw.rsplit(")", 1)[1].split()
            out[pid] = ((int(parts[11]) + int(parts[12])) / CLK, comm)
        except (OSError, IndexError, ValueError):
            continue
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--arrow-batch", type=int, default=None)
    ap.add_argument("--codec", default=None, help="shuffle compression codec")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--repartition-mult", type=int, default=None,
                    help="override the encode stage's tasks-per-core fan-out")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import _warm_workers
    from sfa_spark.encode import encode_tier_blocks_gapfill
    from sfa_spark.session import get_spark

    extra = {}
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/sfa-shuffle"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    if args.arrow_batch:
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = str(args.arrow_batch)
    if args.codec:
        extra["spark.io.compression.codec"] = args.codec
    spark = get_spark(
        f"encode_profile_{args.cores}",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions or args.cores,
        extra_conf=extra,
    )
    _warm_workers(spark, args.cores)
    t1m = spark.read.parquet(args.input)
    kw = {}
    if args.repartition_mult:
        kw["partitions"] = args.repartition_mult * args.cores

    def run():
        return (
            encode_tier_blocks_gapfill(t1m, "user_id", tier="1m", **kw)
            .agg(F.sum("n"))
            .collect()[0][0]
        )

    run()  # warm: JIT, page cache, shuffle files, worker imports
    pids = _descendants(os.getpid())
    before = _cpu_seconds(pids)
    t0 = time.perf_counter()
    pts = run()
    wall = time.perf_counter() - t0
    after = _cpu_seconds(_descendants(os.getpid()))

    py_cpu = jvm_cpu = 0.0
    for pid, (sec, comm) in after.items():
        delta = sec - before.get(pid, (0.0, comm))[0]
        if "java" in comm:
            jvm_cpu += delta
        else:
            py_cpu += delta
    cap = wall * args.cores
    out = {
        "cores": args.cores,
        "wall": round(wall, 3),
        "points": int(pts),
        "pts_per_sec": int(pts / wall),
        "py_cpu": round(py_cpu, 2),
        "jvm_cpu": round(jvm_cpu, 2),
        "cpu_capacity": round(cap, 2),
        "py_share": round(py_cpu / cap, 3),
        "jvm_share": round(jvm_cpu / cap, 3),
        "idle_share": round(max(0.0, 1 - (py_cpu + jvm_cpu) / cap), 3),
        "conf": {
            "arrow_batch": args.arrow_batch or 65536,
            "codec": args.codec or "lz4",
            "shuffle_partitions": args.shuffle_partitions or args.cores,
            "repartition_mult": args.repartition_mult,
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
