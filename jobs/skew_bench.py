"""Hot-domain skew evidence, end-to-end (SURVEY H7, VERDICT r4 #5).

Generates the Zipf page table with 10 heavy urls holding ~30% of rows
(sfa_spark.generator — the north rule's hot-domain scenario), then
measures the two stages skew could hurt, each plain vs its mitigation:

1. **Tier aggregation** — ``rollup_tier`` (groupBy url+bucket) vs the
   explicit two-stage ``salted`` variant built from skew.salted_agg's
   recipe (full rollup semantics: n/sum/min/max + min_by/max_by merged
   through per-salt partials). Hypothesis (SURVEY §2/H7 analysis):
   salting does NOT pay here, because Catalyst's partial (map-side)
   aggregation already combines a hot url's rows before the shuffle and
   the bucket key keeps cardinality high. The job asserts result parity
   and reports both wall times so the claim is measured, not asserted.

2. **Per-group encode kernel** on a SHARP-skew tier (one hot key
   holding 30% of all buckets — the single-giant-task shape the Zipf
   page table's 10-way heavy set doesn't produce): three task shapes
   over identical data —
     * fused streaming kernel (partition by key): a key is never
       split, so the hot key is one task — the straggler ceiling;
     * per-key ``applyInPandas`` (``max_block`` ≈ ∞): same straggler
       plus per-group overhead;
     * epoch-chunked ``applyInPandas`` (the shipped
       ``encode_tier_blocks`` grouping): the hot key splits into
       bounded (key, chunk) tasks — no straggler, at per-group
       overhead cost.
   Wall times quantify the tradeoff the engine actually ships: fused
   for throughput when skew is mild, chunked grouping when one key
   dominates.

3. **Work-distribution stats** — rows per group for per-key grouping vs
   per-(key, 1m bucket) vs per-(key, epoch chunk) on both tables:
   max-share is the biggest single task a grouped op would schedule.

Run:  python jobs/skew_bench.py [--urls 360] [--mean-crawls 600]
      [--cores 8] [--reps 3] [--out BENCH/skew.json]

Writes one JSON blob (also printed) consumed by BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--urls", type=int, default=360)
    p.add_argument("--mean-crawls", type=int, default=600)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="BENCH/skew.json")
    return p


def salted_rollup(signals, factor: int = 16):
    """Full rollup_tier semantics through an explicit two-stage salt:
    per-(key, bucket, salt) partials, then a ≤factor-row merge per
    group. first/last merge via min_by/max_by on the partial's min/max
    timestamp (associative, so salt-split is lossless)."""
    from sfa_spark.rollup import bucket_expr
    from sfa_spark.skew import with_salt

    v = F.col("value")
    s1 = (
        with_salt(signals, "_salt", factor)
        .groupBy("url", bucket_expr("warc_ts", "1m").alias("bucket_ts"), "_salt")
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("sum"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.min("warc_ts").alias("_mn_ts"),
            F.max("warc_ts").alias("_mx_ts"),
            F.min_by(v, F.col("warc_ts")).alias("first"),
            F.max_by(v, F.col("warc_ts")).alias("last"),
        )
    )
    return s1.groupBy("url", "bucket_ts").agg(
        F.sum("n").alias("n"),
        F.sum("sum").alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.min_by("first", "_mn_ts").alias("first"),
        F.max_by("last", "_mx_ts").alias("last"),
    )


def group_share_stats(df, *group_cols):
    """Rows per group → {groups, max_rows, p50_rows, max_share}: the
    biggest single task a per-group kernel would schedule."""
    g = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("rows"))
    stats = g.agg(
        F.count(F.lit(1)).alias("groups"),
        F.max("rows").alias("max_rows"),
        F.expr("percentile_approx(rows, 0.5)").alias("p50_rows"),
        F.sum("rows").alias("total"),
    ).first()
    return {
        "groups": int(stats["groups"]),
        "max_rows": int(stats["max_rows"]),
        "p50_rows": int(stats["p50_rows"]),
        "max_share": round(stats["max_rows"] / stats["total"], 4),
    }


def main() -> None:
    args = build_parser().parse_args()
    from sfa_spark.generator import generate_pages
    from sfa_spark.session import get_spark

    spark = get_spark("skew_bench", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    pages = generate_pages(
        spark, n_urls=args.urls, mean_crawls=args.mean_crawls, span_days=14.0
    )
    signals = pages.select(
        "url", "warc_ts", F.length("text").cast("double").alias("value")
    ).persist()
    total = signals.count()

    from sfa_spark.skew import hot_keys

    hot = hot_keys(signals, ["url"], threshold_fraction=0.01).collect()
    heavy_rows = sum(r["n_rows"] for r in hot)
    out: dict = {
        "rows": total,
        "cores": args.cores,
        "hot_urls": len(hot),
        "heavy_fraction": round(heavy_rows / total, 4),
    }

    def timed(fn, reps=args.reps) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # -- stage 1: aggregation, plain vs salted -------------------------
    # INTERLEAVED best-of-reps: whichever arm runs first pays a ~20%
    # codegen/JIT warmup (measured — order swap flips the "winner"), so
    # sequential timing would fake a salting win; alternating reps give
    # both arms equal warmth (the same lesson as bench.py's best-of-3)
    from sfa_spark.rollup import rollup_tier

    plain = rollup_tier(signals, ["url"], "warc_ts", "value", "1m")
    salted = salted_rollup(signals)
    best_p = best_s = float("inf")
    for _ in range(args.reps + 1):
        t0 = time.time()
        plain.count()
        best_p = min(best_p, time.time() - t0)
        t0 = time.time()
        salted.count()
        best_s = min(best_s, time.time() - t0)
    out["rollup_plain_s"] = round(best_p, 3)
    out["rollup_salted_s"] = round(best_s, 3)
    # parity: the salt must not change any value (round the
    # order-sensitive sum on both sides before the anti-join)
    norm = lambda df: df.select(  # noqa: E731
        "url", "bucket_ts", "n", F.round("sum", 6).alias("sum"),
        "min", "max", "first", "last",
    )
    diff = norm(plain).exceptAll(norm(salted)).count()
    assert diff == 0, f"salted rollup diverged on {diff} rows"
    out["salted_parity"] = "exact"

    # page-table work distribution: 10-way heavy set → max key share is
    # small; the agg's (key, bucket) grouping is skew-free outright
    from sfa_spark.rollup import bucket_expr

    out["dist_pages_per_key"] = group_share_stats(signals, "url")
    out["dist_pages_per_key_bucket"] = group_share_stats(
        signals, "url", bucket_expr("warc_ts", "1m")
    )

    # -- stage 2: encode kernel task shapes on a SHARP-skew tier -------
    # one hot key with 30% of all (dense, contiguous) 1m buckets
    from sfa_spark.encode import encode_tier_blocks, encode_tier_blocks_gapfill

    n_cold, cold_rows, hot_rows = 63, 45_000, 1_200_000
    total_rows = hot_rows + n_cold * cold_rows
    base_us = 1_700_000_000_000_000  # epoch μs, arbitrary fixed origin
    ids = spark.range(total_rows)
    sharp = ids.select(
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise((F.col("id") - hot_rows) % n_cold + 1)
        .alias("key"),
        F.timestamp_micros(
            F.lit(base_us)
            + F.when(F.col("id") < hot_rows, F.col("id"))
            .otherwise((F.col("id") - hot_rows) / n_cold)
            .cast("long")
            * 60_000_000
        ).alias("bucket_ts"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 10.0).alias("last"),
    ).persist()
    sharp.count()
    out["sharp_rows"] = total_rows
    out["sharp_hot_share"] = round(hot_rows / total_rows, 3)

    out["encode_fused_s"] = timed(
        lambda: encode_tier_blocks_gapfill(
            sharp, ["key"], tier="1m", value_col="last"
        ).count()
    )
    out["encode_chunked_s"] = timed(
        lambda: encode_tier_blocks(
            sharp, ["key"], tier="1m", value_col="last", max_block=65536
        ).count()
    )
    # 1<<24 minutes ≈ 31 years per block: every key's history is ONE
    # group — the naive per-key task shape (straggler + overhead)
    out["encode_per_key_s"] = timed(
        lambda: encode_tier_blocks(
            sharp, ["key"], tier="1m", value_col="last", max_block=1 << 24
        ).count()
    )

    chunk_us = 60_000_000 * 65536
    out["dist_sharp_per_key"] = group_share_stats(sharp, "key")
    out["dist_sharp_per_chunk"] = group_share_stats(
        sharp.select(
            "key",
            (F.unix_micros("bucket_ts") / F.lit(chunk_us)).cast("long").alias("blk"),
        ),
        "key",
        "blk",
    )
    sharp.unpersist()

    # salting verdict threshold is 2/3: the plain-vs-salted delta on this
    # host is ±20% run noise (the (key, bucket) grouping has max 6 rows
    # per group — there is no straggler for the salt to relieve), so only
    # a decisive speedup would justify the extra shuffle stage
    out["verdict"] = {
        "salting_pays_for_agg": out["rollup_salted_s"]
        < (2 / 3) * out["rollup_plain_s"],
        "chunking_beats_per_key": out["encode_chunked_s"]
        < 0.8 * out["encode_per_key_s"],
        "chunking_beats_fused_under_sharp_skew": out["encode_chunked_s"]
        < 0.8 * out["encode_fused_s"],
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
