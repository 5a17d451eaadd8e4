"""Physical-plan quality gates — the scale properties the engine relies on
must survive refactors: column pruning reaches the parquet scan, tier
aggregation is map-side combined (partial+final), small dimension joins
broadcast, and fan-out stages keep explicit partitioning.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sfa_spark.encode import encode_tier_blocks_gapfill
from sfa_spark.rollup import gap_fill_locf, rollup_tier


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rollup_prunes_columns_and_combines_map_side(events):
    p = plan_of(rollup_tier(events, ["user_id"], "ts", "value", "1m"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "user_id", "value"}, cols  # 3 of 6 columns read
    assert p.count("HashAggregate") >= 2  # partial + final


def test_scan_fixup_fires_only_on_starved_bare_scans(spark, events):
    """r6 unsplittable-scan fixup (guide §2.5): a bare parquet scan with
    too few partitions is repartitioned by key (REPARTITION_BY_NUM, so
    AQE never coalesces it) and the aggregation reuses that one
    exchange; any composed input keeps the classic map-side-combined
    shape with NO injected repartition."""
    from pyspark.sql.window import Window as W

    p = plan_of(rollup_tier(events, ["user_id"], "ts", "value", "1m"))
    assert "REPARTITION_BY_NUM" in p, p[:1500]
    assert p.count("Exchange") == 1, p[:1500]  # agg reuses the repartition

    composed = events.withColumn(
        "r", F.row_number().over(W.partitionBy("user_id").orderBy("ts"))
    )
    p2 = plan_of(rollup_tier(composed, ["user_id"], "ts", "value", "1m"))
    assert "REPARTITION_BY_NUM" not in p2, p2[:1500]


def test_scan_fixup_counts_row_groups_not_byte_splits(spark, events, tmp_path):
    """r6 continuation: Spark sizes splits to totalSize/parallelism, so a
    large single-row-group file 'yields' ~cores splits of which all but
    one are EMPTY — split count alone said 'not starved' and the fixup
    silently stopped firing at scale (measured: 1m rollup 7.7s vs 3.3s
    at a 10M-row single-row-group table). The starved check must bound
    splits by the real parallelizable units: parquet row groups."""
    from sfa_spark.scanfix import _row_group_units, pin_scan_parallelism

    path = str(tmp_path / "one_rg.parquet")
    # one row group; split sizing of ~size/parallelism makes Spark report
    # ~parallelism splits (the exact sizing the big-file regime produces)
    events.coalesce(1).write.mode("overwrite").parquet(path)
    import glob as _glob
    import os as _os

    size = sum(
        _os.path.getsize(f) for f in _glob.glob(f"{path}/part-*.parquet")
    )
    p = spark.sparkContext.defaultParallelism
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(max(1, size // p))
        )
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        df = spark.read.parquet(path).select("user_id", "ts", "value")
        assert df.rdd.getNumPartitions() * 2 > p  # splits say "fine"...
        n_files = len(df.inputFiles())
        assert _row_group_units(df, p) == n_files  # ...row groups say "starved"
        if n_files * 2 <= p:
            fixed = pin_scan_parallelism(df, ["user_id"])
            assert "RepartitionByExpression" in str(
                fixed._jdf.queryExecution().optimizedPlan()
            )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_dense_spine_fanout_survives_aqe(events):
    """r6: the pre-explode repartition must reach the physical plan as
    REPARTITION_BY_NUM (AQE's min-partition floor had been coalescing
    the ENSURE_REQUIREMENTS exchange it collapsed into, running the
    whole explode fan-out in a handful of tasks)."""
    from sfa_spark.rollup import dense_spine

    t = rollup_tier(events, ["user_id"], "ts", "value", "1h")
    p = plan_of(dense_spine(t, ["user_id"], "1h"))
    assert "REPARTITION_BY_NUM" in p, p[:2000]


def test_locf_is_join_free(events):
    """r6: gap-fill generates dense rows straight from the observed rows
    (lead + sequence explode, LOCF by construction) — no spine join, no
    broadcast of the tier, no second pass for bounds, and the one window
    runs over OBSERVED rows only (before the Generate fan-out)."""
    # filter makes the plan unique so it can't resolve to a cache some
    # other test file created for the same tier (the CacheManager is
    # session-wide and matches whole subtrees)
    t = rollup_tier(
        events.filter("user_id % 7 != 3"), ["user_id"], "ts", "value", "1h"
    )
    p = plan_of(gap_fill_locf(t, ["user_id"], "1h"))
    # assert only on the LOCF operators, which sit above the leaf scan in
    # the printed tree (root prints first; a cached input would repeat
    # node names inside its embedded plan text)
    leaf = min(
        i for i in (p.find("InMemoryTableScan"), p.find("Scan parquet"), len(p))
        if i >= 0
    )
    p = p[:leaf]
    for node in ("Join", "BroadcastExchange", "CartesianProduct"):
        assert node not in p, f"{node} crept back into the LOCF plan:\n{p[:2000]}"
    assert p.count("Window") == 1  # lead + carry share one window pass
    assert p.count("Generate") == 1  # the dense fan-out
    # the window must run BEFORE the explode (observed rows, not dense)
    assert p.index("Generate") < p.index("Window")


def test_encode_pins_explicit_partitioning(events):
    t = rollup_tier(events, ["user_id"], "ts", "value", "1m")
    p = plan_of(encode_tier_blocks_gapfill(t, "user_id", tier="1m"))
    # the fan-out repartition must be REPARTITION_BY_NUM (user-pinned,
    # AQE may not coalesce it away)
    assert "REPARTITION_BY_NUM" in p or "RoundRobinPartitioning" in p or re.search(
        r"Exchange hashpartitioning\(user_id.*REPARTITION", p
    ), p


def test_filter_pushdown_reaches_scan(events):
    p = plan_of(events.filter(F.col("user_id") == 7).select("value"))
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]" in p, p


def test_ngram_jaccard_no_cartesian(spark, documents):
    """n-gram Jaccard is pure set algebra over equi-joins — a cartesian
    product would be quadratic at web scale."""
    from pyspark.sql import functions as F

    from sfa_spark.operators.dedup import ngram_jaccard_pairs

    ids = documents.select("doc_id")
    pairs = ids.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
    p = plan_of(ngram_jaccard_pairs(documents, pairs, n=3))
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p


def test_quality_features_prunes_scan(spark, documents):
    """Quality features read only (doc_id, text) of the documents table."""
    import re as _re

    from sfa_spark.operators.textstats import quality_score

    p = plan_of(quality_score(documents.select("doc_id", "text")))
    m = _re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, cols


def test_lsh_candidates_no_cartesian(spark, documents):
    from sfa_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures

    sigs = minhash_signatures(documents.limit(50))
    p = plan_of(minhash_lsh_candidates(sigs))
    assert "CartesianProduct" not in p


def test_ivf_sample_plan_scale_path_has_no_sort(spark, embeddings):
    """Above the auto-mod threshold the IVF fit's sampling plan is scan +
    hash-mod filter + distributed ordered LIMIT — no full Sort exchange
    anywhere over the corpus (the round-4 scale footgun: the old default
    sorted the whole corpus by id), and the driver collect is capped at
    sample_rows even if a caller-supplied mod underestimates the corpus
    (self-review r5)."""
    from sfa_spark.operators.similarity import ivf_sample_plan

    s, mod = ivf_sample_plan(embeddings, sample_rows=100, corpus_rows=10_000_000)
    assert mod == 100_000
    p = plan_of(s)
    assert "Sort" not in p, p  # TakeOrderedAndProject ≠ a Sort exchange
    assert "TakeOrderedAndProject" in p, p
    assert "xxhash64" in p, p

    # below the threshold (estimate supplied, no count job): exact path
    s2, mod2 = ivf_sample_plan(embeddings, sample_rows=100_000, corpus_rows=500)
    assert mod2 == 0
    # the exact path IS an ordered limit (Catalyst compiles orderBy+limit
    # to TakeOrderedAndProject — top-k, cheaper than a full Sort)
    assert "TakeOrderedAndProject" in plan_of(s2)


def test_lsh_and_cosine_near_dup_plans_no_cartesian(spark, embeddings):
    """The pinned-plane oracle modes must keep the scale shape: bucket
    equi-joins (broadcast query side for top-k), never a cartesian
    product over the corpus."""
    from pyspark.sql import functions as F

    from sfa_spark.operators.similarity import cosine_near_dup, lsh_topk

    rng = __import__("numpy").random.default_rng(29)
    planes = __import__("numpy").round(rng.standard_normal((2, 4, 64)), 6)
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")

    p = plan_of(lsh_topk(emb, q, k=3, n_planes=4, n_tables=2, planes=planes))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p, p[:1500]

    p2 = plan_of(cosine_near_dup(emb, planes=planes, n_planes=4, n_tables=2))
    assert "CartesianProduct" not in p2


def test_sfa_words_plan_has_no_window_and_batched_groups(spark, events):
    """The SFA downsample stage must stay window-free (order comes from
    the dense bucket_ts, not a row_number shuffle+sort) and group by the
    COARSE bucket (G groups), not per-series — the per-group Arrow/python
    overhead is the 10^9-series bottleneck."""
    from sfa_spark.pipeline import sfa_downsample_words
    from sfa_spark.rollup import gap_fill_locf, rollup_tier

    t = rollup_tier(
        events.withColumn("url", F.concat(F.lit("u"), F.col("user_id")))
        .withColumn("signal", F.lit("value"))
        .limit(2000),
        ["url", "signal"],
        "ts",
        "value",
        "1h",
    )
    filled = gap_fill_locf(t, ["url", "signal"], "1h")
    p = plan_of(sfa_downsample_words(spark, filled))
    # upstream LOCF legitimately uses lag/last windows; the SFA stage must
    # not reintroduce its row_number relabeling (a full shuffle+sort)
    assert "row_number" not in p, "row_number window crept back into the SFA path"
    assert "FlatMapGroupsInPandas" in p
    # the grouping key must be the coarse pmod bucket, not the raw series id
    assert "pmod" in p, p[:2000]


def test_hll_registers_all_jvm_and_map_side_combined(events):
    """The sketch data plane must stay in whole-stage codegen: native
    xxhash64, no Python eval anywhere, partial+final aggregation."""
    from sfa_spark.operators.sketches import hll_registers

    ev = events.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
    p = plan_of(hll_registers(ev, ["day"], "user_id"))
    assert "HashAggregate" in p and p.count("HashAggregate") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "xxhash64" in p, p


def test_m4_prunes_scan_and_combines_map_side(events):
    from sfa_spark.operators.downsample import m4_downsample

    p = plan_of(
        m4_downsample(
            events, ["user_id"], "ts", "value",
            F.date_trunc("day", F.col("ts")), 86400, width=16,
        )
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "user_id", "value"}, cols
    assert p.count("HashAggregate") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_interval_join_single_hash_join_no_nested_loop(events):
    from sfa_spark.operators.rangejoin import interval_join

    ivl = events.groupBy("user_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    p = plan_of(
        interval_join(
            events.select("user_id", "ts", "value"),
            ivl, on=["user_id"], start_col="s", end_col="e",
            bucket_seconds=86400,
        )
    )
    assert "NestedLoop" not in p and "CartesianProduct" not in p, p
    assert "Join" in p, p


def test_counter_rate_single_window_then_partial_agg(events):
    from sfa_spark.operators.rate import counter_increase

    c = events.select("user_id", "ts", "event_id", F.col("event_id").alias("ctr"))
    p = plan_of(counter_increase(c, ["user_id"], "ts", "ctr", "1h", ["event_id"]))
    assert p.count("Window") == 1, p  # exactly one per-key ordered pass
    assert p.count("HashAggregate") >= 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_twa_single_window_no_python(events):
    from sfa_spark.operators.twa import time_weighted_avg

    p = plan_of(time_weighted_avg(events, ["user_id"], "ts", "value", "1h"))
    assert p.count("Window") == 1, p  # one lead pass per key
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert p.count("HashAggregate") >= 2, p  # partial+final
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "user_id", "value", "event_id"} - {"event_id"} or cols == {
        "ts", "user_id", "value"
    }, cols


def test_shuffle_shards_all_jvm(documents):
    from sfa_spark.operators.shuffle import shuffle_shards

    p = plan_of(shuffle_shards(documents.select("doc_id"), "doc_id", 7, 8))
    assert "xxhash64" in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    # the rank sorts WITHIN shards (partitioned sort), not globally
    assert "Exchange rangepartitioning" not in p, p
    # r6: two-level rank — the big-table window partitions by
    # (shard, sub-range), so no single task ever sorts a whole shard
    assert "windowspecdefinition(shard" in p and "_sub" in p, p


def test_shuffle_shards_two_level_rank_matches_single_window(spark, documents):
    """The two-level (sub-range rank + prefix-sum offset) pos must equal
    the single-window rank exactly, for several sub-split widths."""
    from pyspark.sql.window import Window as W

    from sfa_spark.operators.shuffle import shuffle_shards

    d = documents.select("doc_id")
    h = F.xxhash64(F.col("doc_id"), F.lit(7).cast("long"))
    ref = (
        d.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(8)))
        .withColumn(
            "pos",
            F.row_number().over(
                W.partitionBy("shard").orderBy(F.col("_h"), F.col("doc_id"))
            )
            - 1,
        )
        .drop("_h")
        .toPandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    ref = ref.astype("int64")
    for k in (1, 3, 6):
        got = (
            shuffle_shards(d, "doc_id", 7, 8, sub_splits_log2=k)
            .toPandas()
            .sort_values(["shard", "pos"])
            .reset_index(drop=True)
            .astype("int64")
        )
        assert got.equals(ref), f"sub_splits_log2={k} diverged"


def test_bpe_token_counts_join_not_force_broadcast(spark, documents):
    """r6: the word→token-count join must not FORCE a broadcast (the
    distinct-word table is 10⁸+ rows on a web corpus); AQE picks the
    strategy from the runtime stage size, which for this small corpus
    still lands on a broadcast join."""
    from sfa_spark.operators.bpe import bpe_token_counts, train_bpe

    docs = documents.select("doc_id", "text").limit(50)
    merges = train_bpe(spark, docs, n_merges=10)
    out = bpe_token_counts(spark, docs, merges)
    init = plan_of(out)
    assert "ResolvedHint" not in init, init[:1500]
    out.count()  # materialize so AQE finalizes the join choice
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, final[:2000]
