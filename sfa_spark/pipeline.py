"""The flagship engine job: pages → signals → tier cascade → gap-fill →
compressed blocks → SFA downsample words (SURVEY.md §7.1 stages 2-6 wired
together; this is what bench.py measures and what `spark-submit
--py-files` would run on a cluster).

DAG (one raw scan, shuffles annotated):

  pages (url, warc_ts, html, text, lang)
    │  extract_text pUDF + lang lag-window          ─ shuffle 1: by url
    ▼
  signals long table (url, warc_ts, signal, value)  ─ narrow (stack)
    │  groupBy(url, signal, minute-bucket)          ─ shuffle 2: partial agg
    ▼                                                 map-side combined
  1m tier ──reagg──▶ 1h tier ──reagg──▶ 1d tier     ─ reuses shuffle-2
    │  dense spine + LOCF (window by url,signal)      partitioning (AQE)
    ▼
  gap-filled tiers
    │  epoch-aligned chunk groups → codecs pUDF     ─ bounded groups
    ▼                                                 (skew-proof)
  block tables (dod_blob, gorilla_blob, metrics)
    +
  SFA words per window over the 1h tier (downsample summary per window,
  north star) — fit broadcast, transform shuffle-free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfa_spark.encode import encode_tier_blocks_gapfill
from sfa_spark.extract import with_signals
from sfa_spark.rollup import gap_fill_locf, reaggregate, rollup_tier

SIGNALS = ("text_len", "lang_stability")


@dataclass
class PipelineResult:
    signals: DataFrame
    tiers: dict[str, DataFrame]
    filled: dict[str, DataFrame]
    blocks: dict[str, DataFrame]
    metrics: dict = field(default_factory=dict)


def signals_long(pages: DataFrame) -> DataFrame:
    """pages → long (url, warc_ts, signal, value) via stack (narrow op)."""
    sig = with_signals(pages)
    n = len(SIGNALS)
    pairs = ", ".join(f"'{s}', {s}" for s in SIGNALS)
    return sig.selectExpr(
        "url", "warc_ts", f"stack({n}, {pairs}) as (signal, value)"
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    gapfill_tiers: tuple[str, ...] = ("1h",),
    encode_tiers: tuple[str, ...] = ("1m", "1h"),
    collect_metrics: bool = True,
) -> PipelineResult:
    keys = ["url", "signal"]
    long_df = signals_long(pages)

    tier_dfs: dict[str, DataFrame] = {}
    prev = None
    for t in tiers:
        if prev is None:
            tier_dfs[t] = rollup_tier(long_df, keys, "warc_ts", "value", t)
        else:
            tier_dfs[t] = reaggregate(tier_dfs[prev], keys, t)
        prev = t

    filled = {
        t: gap_fill_locf(tier_dfs[t], keys, t) for t in gapfill_tiers if t in tier_dfs
    }

    blocks = {}
    for t in encode_tiers:
        if t in tier_dfs:
            # fused gap-fill + encode: dense data never materializes as rows
            blocks[t] = encode_tier_blocks_gapfill(
                tier_dfs[t], keys, tier=t, value_col="last"
            )

    metrics: dict = {}
    if collect_metrics:
        for t, b in blocks.items():
            row = b.agg(
                F.count(F.lit(1)).alias("blocks"),
                F.sum("n").alias("points"),
                F.sum("raw_bytes").alias("raw"),
                F.sum("enc_bytes").alias("enc"),
            ).collect()[0]
            metrics[t] = {
                "blocks": row["blocks"],
                "points": row["points"],
                "raw_bytes": row["raw"],
                "enc_bytes": row["enc"],
                "ratio": (row["enc"] / row["raw"]) if row["raw"] else None,
            }

    return PipelineResult(
        signals=long_df, tiers=tier_dfs, filled=filled, blocks=blocks, metrics=metrics
    )


def sfa_downsample_words(
    spark: SparkSession,
    filled_tier: DataFrame,
    window_size: int = 16,
    word_length: int = 4,
    alphabet_size: int = 4,
    group_target_rows: int = 2_000_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """SFA-style windowed DFT + MCB words over a gap-filled tier — the
    'downsample summary per window' the north star names. Key = (url,
    signal); series = LOCF-carried ``last`` ordered by bucket.

    Series index ``t`` is the dense bucket row number (buckets are regular
    after gap-fill, so integer positions == time order).
    """
    from sfa_spark.transform.sfa_df import fit_windowing_df, transform_windowing_df

    # the kernels only need a MONOTONIC order key per series — the dense
    # gap-filled bucket_ts already is one, so no row_number window (that
    # was a full shuffle+sort just to relabel an existing order)
    series = filled_tier.select(
        F.xxhash64("url", "signal").alias("series_id"),
        "url",
        "signal",
        F.unix_micros("bucket_ts").alias("t"),
        F.col("last").alias("value"),
    )
    # Coarse-group batching: G pandas groups total (not one per series) —
    # each group stacks its series and runs the znorm/DFT/quantize math
    # as matrix passes (mft *_rows kernels, bit-identical), so per-group
    # python+Arrow overhead is paid G times instead of once per series.
    # G must SCALE WITH DATA, not just cores: a group is one pandas frame
    # in one task, so its size is rows/G — cap it at ~group_target_rows
    # (~16 MB of values) regardless of input scale. ``approx_rows`` comes
    # free when the tier is read from a snapshot (the manifest records
    # per-partition row counts) or was just counted (bench's cache
    # policy); without it, one count on the input pays for the bound.
    pre_cache = None
    if approx_rows is None:
        # count the persisted skinny projection, NOT the raw input — the
        # upstream cascade then computes once (for this count) and the
        # repartition below reads the cache instead of recomputing;
        # unpersisted below once the repartitioned cache is materialized
        pre_cache = series = series.persist()
        n_rows = series.count()
    else:
        n_rows = approx_rows
    # floor = cores (one kernel call per core fills the cluster in one
    # wave): the old 4× floor quadrupled the per-group python+Arrow
    # overhead for nothing at small row counts (r6 sweep: g=32 1.06s vs
    # g=128 1.60s end-to-end at 233k rows); the data-driven term still
    # raises G with scale so a group never exceeds ~group_target_rows
    g = max(
        spark.sparkContext.defaultParallelism,
        -(-n_rows // group_target_rows),
    )
    # partition ONCE by the same bucket expression both stages group by,
    # persisted: the fit stage materializes it eagerly (bin edges are
    # collected + broadcast) and the transform stage reads it again with
    # no further exchange. (not unpersisted here: the returned plan still
    # reads it — Spark's LRU storage eviction reclaims the blocks)
    series = series.repartition(
        F.pmod(F.xxhash64("series_id"), F.lit(g)).cast("int")
    ).persist()
    model = fit_windowing_df(
        series, "series_id", "t", "value",
        window_size, word_length, alphabet_size, norm_mean=True,
        group_buckets=g, approx_rows=n_rows,
    )
    if pre_cache is not None:
        # the fit stage materialized the repartitioned cache (bin edges
        # were collected), so the pre-repartition projection is no
        # longer read by anything — drop it instead of holding two full
        # copies of the skinny series for the job's lifetime
        pre_cache.unpersist()
    # (url, signal) ride through the kernel as per-series constants —
    # the old distinct + broadcast-join back onto the words paid one
    # aggregation and one exchange per query for names the kernel
    # already had in hand (r6)
    words = transform_windowing_df(
        series, model, "series_id", "t", "value", pack=True, group_buckets=g,
        carry_cols=["url", "signal"],
    )
    return words.select("url", "signal", "offset", "word")
