"""Dedup family + similarity search on the documents/embeddings testdata."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sfa_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_jaccard_estimate,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_dedup,
    simhash_fingerprints,
)
from sfa_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_dup,
    lsh_topk,
)


@pytest.fixture(scope="module")
def docs_with_dups(spark, documents):
    """documents + planted near/exact duplicates with known ids."""
    base = documents.limit(40).cache()
    exact = base.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    near = base.limit(5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny suffix")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(exact).unionByName(near).cache()


def test_exact_dedup(spark, docs_with_dups):
    kept = exact_dedup(docs_with_dups)
    assert kept.count() == 45  # 40 uniques + 5 near (not exact)
    groups = exact_dup_groups(docs_with_dups).toPandas()
    assert len(groups) == 5
    assert (groups["dup_id"] - groups["keeper_id"] == 100000).all()


def test_minhash_estimates_match_true_jaccard(spark, docs_with_dups):
    sigs = minhash_signatures(docs_with_dups, num_hashes=128).cache()
    pairs = spark.createDataFrame(
        [(i, i + 100000) for i in range(5)], "id_a long, id_b long"
    )
    est = minhash_jaccard_estimate(sigs, pairs).toPandas()
    assert (est["jaccard_est"] == 1.0).all()  # exact copies
    near_pairs = spark.createDataFrame(
        [(i, i + 200000) for i in range(5)], "id_a long, id_b long"
    )
    est2 = minhash_jaccard_estimate(sigs, near_pairs).toPandas()
    assert (est2["jaccard_est"] > 0.6).all()


def test_minhash_lsh_finds_planted_dups(spark, docs_with_dups):
    found = minhash_lsh_dedup(docs_with_dups, threshold=0.7).toPandas()
    pairs = set(zip(found["id_a"], found["id_b"]))
    for i in range(5):
        assert (i, i + 100000) in pairs, f"exact dup {i} missed"
    near_found = sum((i, i + 200000) in pairs for i in range(5))
    assert near_found >= 4  # probabilistic but with 16 bands basically sure


def test_simhash_dedup_finds_planted(spark, docs_with_dups):
    found = simhash_dedup(docs_with_dups, max_hamming=3).toPandas()
    pairs = set(zip(found["id_a"], found["id_b"]))
    for i in range(5):
        assert (i, i + 100000) in pairs
    # the synthetic docs share a tiny vocabulary, so distinct docs
    # legitimately land near each other; just require non-degeneracy
    fps = simhash_fingerprints(docs_with_dups).toPandas()
    assert fps["simhash"].nunique() > 5


def test_ngram_jaccard_exact_for_identical(spark, docs_with_dups):
    pairs = spark.createDataFrame(
        [(i, i + 100000) for i in range(5)] + [(0, 1)], "id_a long, id_b long"
    )
    j = ngram_jaccard_pairs(docs_with_dups, pairs).toPandas().set_index(["id_a", "id_b"])
    for i in range(5):
        assert j.loc[(i, i + 100000), "jaccard"] == 1.0
    assert j.loc[(0, 1), "jaccard"] < 0.5


@pytest.fixture(scope="module")
def queries(spark, embeddings):
    return (
        embeddings.limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .cache()
    )


def test_brute_force_topk_oracle(spark, embeddings, queries):
    got = brute_force_topk(embeddings, queries, k=5).toPandas()
    emb = embeddings.toPandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    q = queries.toPandas()
    for _, row in q.iterrows():
        v = np.asarray(row["embedding"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        scores = mat @ v
        order = np.lexsort((ids, -scores))[:5]
        want = ids[order]
        g = got[got["query_id"] == row["query_id"]].sort_values("rank")
        np.testing.assert_array_equal(g["vec_id"].to_numpy(), want)


def test_query_is_own_top1(spark, embeddings, queries):
    got = brute_force_topk(embeddings, queries, k=1).toPandas()
    assert (got["vec_id"] == got["query_id"]).all()
    np.testing.assert_allclose(got["score"], 1.0, atol=1e-6)


def test_lsh_topk_finds_high_similarity_neighbors(spark, embeddings):
    """Hyperplane LSH targets HIGH-cosine neighbors (collision prob.
    (1-θ/π)^planes). Queries are small perturbations of corpus vectors:
    the true neighbor (cos ≈ 0.99+) must be recovered; random
    near-orthogonal vectors are out of scope by construction."""
    import numpy as np

    rng = np.random.default_rng(9)
    base = embeddings.limit(5).toPandas()
    qrows = []
    for _, r in base.iterrows():
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v + rng.standard_normal(v.size) * 0.02 * np.linalg.norm(v) / np.sqrt(v.size)
        qrows.append((int(r["vec_id"]), [float(x) for x in v]))
    queries = spark.createDataFrame(qrows, "query_id long, embedding array<float>")
    approx = lsh_topk(embeddings, queries, k=3, n_planes=8, n_tables=8).toPandas()
    top1 = approx[approx["rank"] == 1]
    assert (top1["vec_id"] == top1["query_id"]).all()
    assert (top1["score"] > 0.95).all()


def test_cosine_near_dup_planted(spark, embeddings):
    twins = embeddings.limit(4).select(
        (F.col("vec_id") + 5000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0000001)).alias("embedding"),
        "label",
    )
    df = embeddings.unionByName(twins)
    found = cosine_near_dup(df, threshold=0.999, n_planes=8, n_tables=6).toPandas()
    pairs = set(zip(found["id_a"], found["id_b"]))
    hits = sum((i, i + 5000) in pairs for i in range(4))
    assert hits >= 3
