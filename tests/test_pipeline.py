"""End-to-end engine pipeline on the synthetic Common-Crawl-style table:
byte-identical extraction, tier values vs pandas oracle, compression,
SFA downsample words, skew utilities.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sfa_spark.extract import verify_extraction, with_signals
from sfa_spark.generator import generate_pages, generate_pages_pandas
from sfa_spark.pipeline import run_pipeline, sfa_downsample_words
from sfa_spark.skew import hot_keys, salted_agg

N_URLS = 60


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, n_urls=N_URLS, mean_crawls=8, span_days=3.0, seed=11).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pages_pd():
    return generate_pages_pandas(n_urls=N_URLS, mean_crawls=8, span_days=3.0, seed=11)


def test_generator_deterministic(pages, pages_pd):
    got = pages.toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    want = pages_pd.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["url"].values == want["url"].values).all()
    assert (got["text"].values == want["text"].values).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(got["html"], want["html"]))


def test_generator_zipf_skew(pages_pd):
    counts = pages_pd.groupby("url").size().sort_values(ascending=False)
    top10 = counts.iloc[:10].sum() / counts.sum()
    assert top10 > 0.25, f"heavy hitters hold only {top10:.0%}"


def test_extraction_byte_identical(pages):
    assert verify_extraction(pages) == 0


def test_lang_stability_signal(pages, pages_pd):
    got = (
        with_signals(pages)
        .select("url", "warc_ts", "lang_stability")
        .toPandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    w = pages_pd.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    prev = w.groupby("url")["lang"].shift()
    want = ((prev.isna()) | (prev == w["lang"])).astype(float)
    np.testing.assert_array_equal(got["lang_stability"].values, want.values)


def pandas_tier_oracle(pages_pd: pd.DataFrame, freq: str) -> pd.DataFrame:
    d = pages_pd.sort_values(["url", "warc_ts"]).copy()
    d["text_len"] = d["text"].str.len().astype(float)
    d["bucket_ts"] = d["warc_ts"].dt.floor(freq)
    g = d.groupby(["url", "bucket_ts"])["text_len"]
    return g.agg(n="count", sum="sum", min="min", max="max",
                 first="first", last="last").reset_index()


def test_tier_values_match_pandas_oracle(spark, pages, pages_pd):
    res = run_pipeline(spark, pages, collect_metrics=False)
    got = (
        res.tiers["1h"]
        .filter(F.col("signal") == "text_len")
        .select("url", "bucket_ts", "n", "sum", "min", "max", "first", "last")
        .toPandas()
        .sort_values(["url", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = pandas_tier_oracle(pages_pd, "1h").sort_values(["url", "bucket_ts"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["n"].values == want["n"].values).all()
    for c in ["min", "max", "first", "last"]:
        np.testing.assert_array_equal(got[c].values, want[c].astype(float).values)
    np.testing.assert_allclose(got["sum"].values, want["sum"].values, rtol=1e-9)


def test_pipeline_end_to_end_metrics(spark, pages):
    res = run_pipeline(spark, pages)
    # raw 1m tier: sparse irregular buckets — modest savings; gap-filled 1h:
    # regular spacing + LOCF repeats — strong compression
    m1, mh = res.metrics["1m"], res.metrics["1h"]
    assert m1["points"] > 0 and m1["ratio"] < 1.0, m1
    assert mh["points"] > 0 and mh["ratio"] < 0.5, mh


def test_sfa_downsample_words(spark, pages):
    res = run_pipeline(spark, pages, collect_metrics=False)
    words = sfa_downsample_words(spark, res.filled["1h"]).toPandas()
    assert len(words) > 0
    assert set(words["signal"]) == {"text_len", "lang_stability"}
    assert (words["word"] < 4 ** 4 * 16).all()  # packed 4 symbols x 2 bits


def test_hot_keys_and_salted_agg(spark, pages):
    hot = hot_keys(pages, ["url"], threshold_fraction=0.02)
    assert hot.count() >= 5  # the generator's heavy hitters
    agg = salted_agg(
        pages.withColumn("v", F.length("text").cast("double")),
        ["url"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "mx": (F.max("v"), F.max("mx")),
            "sm": (F.sum("v"), F.sum("sm")),
        },
        factor=8,
    ).toPandas().sort_values("url").reset_index(drop=True)
    direct = (
        pages.withColumn("v", F.length("text").cast("double"))
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"), F.sum("v").alias("sm"))
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (agg["n"].values == direct["n"].values).all()
    np.testing.assert_array_equal(agg["mx"].values, direct["mx"].values)
    np.testing.assert_allclose(agg["sm"].values, direct["sm"].values, rtol=1e-9)


def test_salted_rollup_full_parity(spark, pages):
    """jobs/skew_bench.py's salted two-stage rollup must reproduce
    rollup_tier EXACTLY — including the min_by/max_by first/last merged
    through per-salt partials via the partial's min/max timestamp. This
    is the CI gate behind the skew-evidence job's parity assertion."""
    import sys as _sys

    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "jobs"))
    from skew_bench import salted_rollup

    from sfa_spark.rollup import rollup_tier

    signals = pages.select(
        "url", "warc_ts", F.length("text").cast("double").alias("value")
    )
    norm = lambda df: df.select(  # noqa: E731
        "url", "bucket_ts", "n", F.round("sum", 6).alias("sum"),
        "min", "max", "first", "last",
    )
    plain = norm(rollup_tier(signals, ["url"], "warc_ts", "value", "1m"))
    salted = norm(salted_rollup(signals, factor=8))
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_extract_expr_equals_udf_edge_cases(spark):
    """The JVM extraction expression ≡ the pandas-UDF reference on edge
    cases: no tags, close before open, empty article, nested/multiple
    articles, empty html, null html."""
    from sfa_spark.extract import extract_text, extract_text_expr

    rows = [
        ("<article>hello</article>",),
        ("pre <article>a</article> mid <article>b</article>",),
        ("</article>early<article>late</article>",),
        ("<article></article>",),
        ("no tags at all",),
        ("<article>unclosed",),
        ("closed only</article>",),
        ("",),
        (None,),
        ("<article>üñïçødé ✓</article>",),
    ]
    df = spark.createDataFrame(rows, "s string").select(
        F.encode("s", "utf-8").alias("html")
    )
    got = (
        df.select(
            extract_text_expr("html").alias("e"),
            extract_text("html").alias("u"),
        )
        .toPandas()
    )
    assert (got["e"].fillna("") == got["u"].fillna("")).all(), got


def test_sfa_downsample_words_single_cache(spark, pages):
    """ADVICE r3 (low): the approx_rows=None path must not leave TWO
    persisted copies of the skinny series (pre- and post-repartition) —
    the pre-repartition cache is unpersisted once the fit stage has
    materialized the repartitioned one."""
    res = run_pipeline(spark, pages, collect_metrics=False)
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    words = sfa_downsample_words(spark, res.filled["1h"])
    words.count()
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    new = after - before
    assert len(new) <= 1, f"expected ≤1 new persisted RDD, got {len(new)}"
