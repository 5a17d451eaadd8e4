"""BOSS bag-of-patterns / tf-idf / 1-NN operators vs pure-python oracles
reproducing the reference formulas (BOSS.java:116-145, BOSSVS.java:58-110,
BOSSEnsembleClassifier.java:182-234).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sfa_spark.operators.boss import (
    bag_of_patterns,
    boss_1nn_distance,
    bossvs_predict,
    numerosity_reduction,
    tfidf_class_matrix,
)


@pytest.fixture(scope="module")
def words_df(spark):
    rows = []
    rng = np.random.default_rng(3)
    for sid in range(6):
        seq = rng.integers(0, 5, size=40)
        for off, w in enumerate(seq):
            rows.append((sid, float(sid % 2), off, int(w)))
    return spark.createDataFrame(rows, "series_id long, label double, offset int, word long").cache()


def test_numerosity_reduction_oracle(words_df):
    got = (
        numerosity_reduction(words_df, ["series_id"])
        .groupBy("series_id")
        .count()
        .toPandas()
        .set_index("series_id")["count"]
    )
    pdf = words_df.toPandas().sort_values(["series_id", "offset"])
    for sid, g in pdf.groupby("series_id"):
        w = g["word"].to_numpy()
        want = 1 + int((w[1:] != w[:-1]).sum())
        assert got[sid] == want


def test_bag_of_patterns_counts(words_df):
    bags = bag_of_patterns(words_df, ["series_id"]).toPandas()
    pdf = words_df.toPandas().sort_values(["series_id", "offset"])
    for sid, g in pdf.groupby("series_id"):
        w = g["word"].to_numpy()
        kept = w[np.concatenate(([True], w[1:] != w[:-1]))]
        want = pd.Series(kept).value_counts()
        got = bags[bags["series_id"] == sid].set_index("word")["count"]
        assert got.to_dict() == {int(k): int(v) for k, v in want.items()}


def test_tfidf_reference_formula(spark, words_df):
    bags = bag_of_patterns(words_df, ["series_id", "label"])
    mat = tfidf_class_matrix(bags).toPandas()
    # python oracle with the literal reference formula
    b = bags.toPandas()
    per_class = b.groupby(["label", "word"])["count"].sum()
    n_classes = b["label"].nunique()
    df_w = per_class.reset_index().groupby("word")["label"].nunique()
    raw = {}
    for (lbl, w), freq in per_class.items():
        df = df_w[w]
        if df == n_classes:
            raw[(lbl, w)] = 0.0
        else:
            raw[(lbl, w)] = (1 + math.log10(freq)) / math.log10(1 + n_classes / df)
    norms = {}
    for (lbl, w), v in raw.items():
        norms[lbl] = norms.get(lbl, 0.0) + v * v
    for _, r in mat.iterrows():
        want = raw[(r["label"], r["word"])]
        nz = math.sqrt(norms[r["label"]])
        want = want / nz if nz > 0 else 0.0
        assert abs(r["tfidf"] - want) < 1e-12


def test_bossvs_predict_separates_classes(spark):
    # class 0 series use words {0,1}, class 1 use words {8,9} → perfect sep
    rows = []
    for sid in range(8):
        lbl = float(sid % 2)
        base = 0 if lbl == 0 else 8
        for off in range(30):
            rows.append((sid, lbl, off, base + (off % 2)))
    df = spark.createDataFrame(rows, "series_id long, label double, offset int, word long")
    train = df.filter(F.col("series_id") < 6)
    test = df.filter(F.col("series_id") >= 6)
    mat = tfidf_class_matrix(bag_of_patterns(train, ["series_id", "label"]))
    pred = bossvs_predict(
        bag_of_patterns(test, ["series_id"]), mat, ["series_id"]
    ).toPandas()
    want = test.select("series_id", "label").distinct().toPandas()
    merged = pred.merge(want, on="series_id")
    assert (merged["predicted"] == merged["label"]).all()


def test_boss_1nn_distance_oracle(spark, words_df):
    bags = bag_of_patterns(words_df, ["series_id"])
    test_b = bags.withColumnRenamed("series_id", "test_id")
    train_b = bags.withColumnRenamed("series_id", "train_id")
    got = boss_1nn_distance(test_b, train_b).toPandas().set_index("test_id")
    # oracle: asymmetric distance over test words only
    b = bags.toPandas()
    bag_map = {
        sid: dict(zip(g["word"], g["count"])) for sid, g in b.groupby("series_id")
    }
    for tid, tbag in bag_map.items():
        best, bestd = None, None
        for rid, rbag in bag_map.items():
            if rid == tid:
                continue
            d = sum((c - rbag.get(w, 0)) ** 2 for w, c in tbag.items())
            if bestd is None or d < bestd or (d == bestd and rid < best):
                best, bestd = rid, d
        assert got.loc[tid, "nn"] == best
        assert abs(got.loc[tid, "distance"] - bestd) < 1e-9
