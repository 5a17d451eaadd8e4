"""Bag-of-patterns operators — Spark-first re-expressions of the reference
BOSS/BOSS VS aggregation pipeline (SURVEY.md §2.5):

* numerosity reduction + bag building (A2) — reference
  transformation/BOSS.java:116-145 builds an IntIntHashMap per series,
  skipping a word equal to its immediate predecessor. Here: a lag window
  + filter + groupBy().count() — a pure hash aggregate, map-side combined.
* tf-idf class matrix (A3) — reference transformation/BOSSVS.java:58-110:
  tf = 1+log10(freq), idf = log10(1 + C/df), tfidf = tf / idf (the
  reference divides — quirk preserved), zeroed when df == C, then the
  class vector is L2-normalized (BOSSVS.java:131-145).
* 1-NN bag distance (J1) — reference BOSSEnsembleClassifier.java:182-234:
  asymmetric squared-difference over the TEST bag's words only. Here: a
  left join test-words → train-bags + hash aggregate + min-window.
* cosine-style class scoring (A4) — BOSSVSClassifier.java:210-261.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def numerosity_reduction(
    words: DataFrame, key_cols: list[str], order_col: str = "offset", word_col: str = "word"
) -> DataFrame:
    """Drop words equal to their immediate predecessor within a series
    (BOSS.java:132-141)."""
    w = W.partitionBy(*key_cols).orderBy(order_col)
    return (
        words.withColumn("_prev", F.lag(word_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col(word_col) != F.col("_prev")))
        .drop("_prev")
    )


def bag_of_patterns(
    words: DataFrame,
    key_cols: list[str],
    order_col: str = "offset",
    word_col: str = "word",
    reduce_numerosity: bool = True,
) -> DataFrame:
    """(key…, word, count) — the exploded BagOfPattern histogram."""
    src = (
        numerosity_reduction(words, key_cols, order_col, word_col)
        if reduce_numerosity
        else words
    )
    return src.groupBy(*key_cols, word_col).agg(F.count(F.lit(1)).alias("count"))


def tfidf_class_matrix(
    bags: DataFrame, label_col: str = "label", word_col: str = "word"
) -> DataFrame:
    """(label, word, tfidf) with the reference's exact formula + L2 norm.

    Scale shape: two hash aggregates (word-counts per class; document
    frequency per word) + one broadcastable join on word + an L2 window
    per class — no driver-side matrices.
    """
    per_class = bags.groupBy(label_col, word_col).agg(F.sum("count").alias("freq"))
    n_classes = per_class.select(label_col).distinct().count()
    df_counts = per_class.groupBy(word_col).agg(
        F.countDistinct(label_col).alias("df")
    )
    joined = per_class.join(F.broadcast(df_counts), word_col)
    tf = F.lit(1.0) + F.log10(F.col("freq"))
    idf = F.log10(F.lit(1.0) + F.lit(float(n_classes)) / F.col("df"))
    raw = F.when(F.col("df") == n_classes, F.lit(0.0)).otherwise(tf / idf)
    scored = joined.select(label_col, word_col, raw.alias("tfidf"))
    l2 = W.partitionBy(label_col)
    return (
        scored.withColumn("_norm", F.sqrt(F.sum(F.pow("tfidf", 2)).over(l2)))
        .withColumn(
            "tfidf",
            F.when(F.col("_norm") > 0, F.col("tfidf") / F.col("_norm")).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("_norm")
    )


def bossvs_predict(
    test_bags: DataFrame,
    class_matrix: DataFrame,
    key_cols: list[str],
    label_col: str = "label",
    word_col: str = "word",
) -> DataFrame:
    """argmax_class Σ_words freq·tfidf (cosine scoring, BOSSVSClassifier
    .java:210-261 sans the +1 shift which cancels under argmax only when
    magnitudes equal — kept literal: score = Σ freq·(tfidf)).

    class_matrix is broadcast (|classes|·|vocab| is small by construction).
    """
    scored = (
        test_bags.join(F.broadcast(class_matrix), word_col)
        .groupBy(*key_cols, label_col)
        .agg(F.sum(F.col("count") * F.col("tfidf")).alias("score"))
    )
    w = W.partitionBy(*key_cols).orderBy(
        F.desc("score"), F.desc(label_col)  # tie → larger label (Classifier.java:485-495)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*key_cols, F.col(label_col).alias("predicted"), "score")
    )


def boss_1nn_distance(
    test_bags: DataFrame,
    train_bags: DataFrame,
    test_key: str = "test_id",
    train_key: str = "train_id",
    word_col: str = "word",
) -> DataFrame:
    """Asymmetric BOSS distance: for each (test, train) pair,
    Σ over words PRESENT IN THE TEST BAG of (tc - trc)², missing train
    count = 0 (BOSSEnsembleClassifier.java:182-234). Returns the 1-NN
    train id per test id.

    Join shape: test bags × train bags on word (hash join; broadcast the
    train side when it fits), then hash-aggregate per pair.
    """
    t = test_bags.select(
        F.col(test_key), F.col(word_col), F.col("count").alias("_tc")
    )
    r = train_bags.select(
        F.col(train_key), F.col(word_col), F.col("count").alias("_rc")
    )
    pair = (
        t.join(r, word_col, "inner")
        .groupBy(test_key, train_key)
        .agg(
            F.sum(F.pow(F.col("_tc") - F.col("_rc"), 2)).alias("_matched"),
            F.sum(F.pow(F.col("_tc"), 2)).alias("_test_sq_matched"),
        )
    )
    # words of the test bag with no match in a given train bag contribute
    # tc²; total Σtc² per test is a tiny broadcastable aggregate
    test_sq = t.groupBy(test_key).agg(F.sum(F.pow("_tc", 2)).alias("_test_sq"))
    dist = pair.join(F.broadcast(test_sq), test_key).select(
        test_key,
        train_key,
        (F.col("_matched") + F.col("_test_sq") - F.col("_test_sq_matched")).alias(
            "distance"
        ),
    )
    w = W.partitionBy(test_key).orderBy(F.asc("distance"), F.asc(train_key))
    return (
        dist.filter(F.col(test_key) != F.col(train_key))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(test_key, F.col(train_key).alias("nn"), "distance")
    )
