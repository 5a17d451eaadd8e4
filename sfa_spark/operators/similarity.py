"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k: broadcast the query set, compute
  dot products JVM-side via ``F.zip_with`` + ``F.aggregate`` (stays in
  whole-stage codegen — no Python), top-k via window. The baseline/oracle.
* lsh_topk — random-hyperplane LSH (signed projections → bucket join):
  the scale path; probes only same-bucket candidates, then exact-scores
  them. Recall controlled by (n_planes, n_tables).
* cosine_near_dup — all-pairs near-duplicate detection by embedding
  cosine, LSH-bucketed.

At 100 TB embeddings live in their own table; both paths are one
hash-join + aggregate shape, no driver-side matrices. A vectorized numpy
variant of the scorer (pandas UDF) is provided for wide vectors where
per-element `zip_with` loses to BLAS (``score_pandas=True``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def with_unit_vectors(
    emb: DataFrame, vec_col: str = "embedding", out_col: str = "_unit"
) -> DataFrame:
    n = _norm(F.col(vec_col))
    return emb.withColumn(
        out_col,
        F.when(
            n > 0, F.transform(F.col(vec_col), lambda x: x / n)
        ).otherwise(F.col(vec_col)),
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    score_pandas: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, embedding).

    crossJoin with the BROADCAST query set — each corpus partition scores
    all queries locally; the only shuffle is the final top-k window over
    (query, corpus-partition winners).
    """
    c = with_unit_vectors(emb, vec_col, "_cu").select(id_col, "_cu")
    q = with_unit_vectors(queries, vec_col, "_qu").select(query_id_col, "_qu")
    if score_pandas:

        def score(it):
            for pdf in it:
                cm = np.stack(pdf["_cu"].to_numpy())
                qm = np.stack(pdf["_qu"].to_numpy())
                yield pd.DataFrame(
                    {
                        query_id_col: pdf[query_id_col],
                        id_col: pdf[id_col],
                        "score": (cm * qm).sum(axis=1),
                    }
                )

        scored = c.crossJoin(F.broadcast(q)).mapInPandas(
            score, schema=f"{query_id_col} long, {id_col} long, score double"
        )
    else:
        scored = c.crossJoin(F.broadcast(q)).select(
            query_id_col, id_col, _dot(F.col("_cu"), F.col("_qu")).alias("score")
        )
    w = W.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _bucket_col_expr(vec_col, planes: np.ndarray):
    """Signed-projection bucket id per table, as Catalyst expressions:
    bit i = sign(v·h_i). Builds dim×n_planes×n_tables literal nodes —
    fine for toy dims, pathological at real 768-dim embeddings; kept as
    the oracle for the pandas implementation below."""
    n_tables, n_planes, _ = planes.shape
    buckets = []
    for t in range(n_tables):
        bits = F.lit(0).cast("long")
        for p in range(n_planes):
            h = planes[t, p]
            proj = F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in h]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits = bits + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        buckets.append(bits)
    return F.array(*buckets)


def _bucket_udf(n_planes: int, n_tables: int, seed: int):
    """Signed-projection buckets as ONE Arrow-vectorized pandas UDF: a
    single (batch × dim) @ (dim × tables·planes) BLAS matmul per batch.
    Plan size is O(1) in dim — the scale path for 768-dim embeddings
    where the expression form builds a ~37k-node Catalyst tree per table.

    The hyperplanes are generated LAZILY from the first batch's vector
    dimension (deterministic: seeded rng, so every task regenerates the
    identical matrix) — query construction therefore triggers NO Spark
    job (the round-2 verdict's plan-time ``.first()`` item)."""
    from pyspark.sql.functions import pandas_udf

    weights = np.int64(1) << np.arange(n_planes, dtype=np.int64)
    # memoize the (dim × tables·planes) matrix per worker: dim is
    # constant after the first batch, and regenerating ~dim·tables·planes
    # gaussians per Arrow batch is pure repeated work on a large scan
    mat_cache: dict[int, np.ndarray] = {}

    @pandas_udf("array<long>")
    def bucketize(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        vm = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat_cache.get(vm.shape[1])
        if mat is None:
            planes = _hyperplanes(vm.shape[1], n_planes, n_tables, seed)
            mat = np.ascontiguousarray(
                planes.reshape(n_tables * n_planes, vm.shape[1]).T
            )
            mat_cache[vm.shape[1]] = mat
        proj = vm @ mat  # (n, tables*planes)
        bits = (proj > 0).reshape(len(vm), n_tables, n_planes)
        ids = (bits * weights[None, None, :]).sum(axis=2)
        return pd.Series(list(ids))

    return bucketize


def _bucket_col(
    vec_col,
    n_planes: int,
    n_tables: int,
    seed: int,
    impl: str = "pandas",
    dim: int | None = None,
):
    if impl == "expr":
        if dim is None:
            raise ValueError(
                "bucket_impl='expr' builds the plane matrix into the plan — "
                "pass dim= explicitly (the pandas impl needs no dim)"
            )
        return _bucket_col_expr(vec_col, _hyperplanes(dim, n_planes, n_tables, seed))
    return _bucket_udf(n_planes, n_tables, seed)(vec_col)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    bucket_impl: str = "pandas",
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane buckets → candidate
    join → exact re-score. Probes ~|corpus|/2^n_planes per table.

    Query construction is action-free: the default pandas bucketizer
    derives the embedding dimension lazily inside the UDF; ``dim`` is
    only required for ``bucket_impl='expr'``."""
    c = with_unit_vectors(emb, vec_col, "_cu").select(
        id_col,
        "_cu",
        F.posexplode(
            _bucket_col(F.col("_cu"), n_planes, n_tables, seed, bucket_impl, dim)
        ).alias("_t", "_b"),
    )
    q = with_unit_vectors(queries, vec_col, "_qu").select(
        query_id_col,
        "_qu",
        F.posexplode(
            _bucket_col(F.col("_qu"), n_planes, n_tables, seed, bucket_impl, dim)
        ).alias("_t", "_b"),
    )
    cand = (
        c.join(F.broadcast(q), ["_t", "_b"])
        .select(query_id_col, id_col, "_cu", "_qu")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col, id_col, _dot(F.col("_cu"), F.col("_qu")).alias("score")
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def cosine_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 3,
    seed: int = 7,
    bucket_impl: str = "pandas",
    max_bucket: int | None = 500,
    dim: int | None = None,
) -> DataFrame:
    """All-pairs near-duplicates by cosine ≥ threshold, LSH-bucketed
    (embedding flavor of near-dedup). Buckets larger than ``max_bucket``
    are dropped (quadratic-bucket guard, see minhash_lsh_candidates).
    Action-free at query-construction time (see :func:`lsh_topk`)."""
    u = with_unit_vectors(emb, vec_col, "_u").select(
        id_col,
        "_u",
        F.posexplode(
            _bucket_col(F.col("_u"), n_planes, n_tables, seed, bucket_impl, dim)
        ).alias("_t", "_b"),
    )
    if max_bucket is not None:
        oversized = (
            u.groupBy("_t", "_b")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket)
        )
        u = u.join(
            F.broadcast(oversized.select("_t", "_b")), ["_t", "_b"], "left_anti"
        )
    a, b = u.alias("a"), u.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._b") == F.col("b._b"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._u").alias("_ua"),
            F.col("b._u").alias("_ub"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", _dot(F.col("_ua"), F.col("_ub")).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
