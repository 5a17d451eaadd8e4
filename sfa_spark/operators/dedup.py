"""Deduplication operators for large-scale training-data pipelines.

All document-level: input is a DataFrame with (id, text). Five families:

  exact_dedup          hash-groupBy on a normalized content hash
  minhash_lsh_dedup    shingle → minhash → band-bucket join (Broder '97 /
                       MMDS ch.3 construction)
  simhash_dedup        Charikar '02 bit-fingerprint + hamming verify
  ngram_jaccard_dedup  exact n-gram Jaccard verification over candidate
                       pairs (usually LSH output)
  embedding-cosine near-dup lives in operators/similarity.py

Scale notes: every family is (cheap per-row signature via vectorized UDF
or built-ins) → (shuffle on signature/bucket) → (verify within bucket).
The only quadratic work is within-bucket, bounded by band width choice.
No driver-side state; signatures are computed with numpy over Arrow
batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def normalized_text(col):
    """Whitespace-collapsed, lowercased content key."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per identical normalized text. One hash agg."""
    h = F.xxhash64(normalized_text(F.col(text_col)))
    return (
        docs.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("_h")
    )


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(keeper_id, dup_id) pairs for identical normalized text."""
    withh = docs.select(id_col, F.xxhash64(normalized_text(F.col(text_col))).alias("_h"))
    w = W.partitionBy("_h").orderBy(id_col)
    return (
        withh.withColumn("keeper", F.min(id_col).over(W.partitionBy("_h")))
        .filter(F.col(id_col) != F.col("keeper"))
        .select(F.col("keeper").alias("keeper_id"), F.col(id_col).alias("dup_id"))
    )


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-character shingle hashes (int64) of one document.

    Fully deterministic across processes/executors: texts shorter than k
    are zero-padded to one k-byte window and go through the same FNV-style
    byte path (python's builtin ``hash`` is seed-randomized per process —
    using it would make signatures differ between executors)."""
    t = text.lower()
    b = t.encode("utf-8", "ignore")
    # byte-level shingles via stride tricks + polynomial-free hashing:
    arr = np.frombuffer(b, dtype=np.uint8)
    if arr.size < k:
        arr = np.concatenate([arr, np.zeros(k - arr.size, dtype=np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    mult = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)  # FNV-ish
    hashes = (win * mult[None, :]).sum(axis=1)
    return np.unique(hashes)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 1,
) -> DataFrame:
    """(id, sig: array<long>) — minhash over character shingles.

    Vectorized per Arrow batch: the (shingles × hash-families) min is one
    numpy matmul-shaped reduction per document.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)

    def batch(it):
        for pdf in it:
            sigs = []
            for text in pdf[text_col]:
                sh = _shingle_hashes(text or "", shingle_k)
                # (n_shingles, num_hashes) permutation values, min per hash
                vals = (sh[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
                sigs.append(vals.min(axis=0).astype(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(
        batch, schema=f"{id_col} long, sig array<long>"
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band bucket.

    The classic LSH shape: explode to (band, bucket-hash) rows, self-join
    within buckets, dedup pairs. Bucket join is a hash join on
    (band, bucket); within-bucket pair counts bound the quadratic work.

    Degenerate buckets (boilerplate/empty-doc clusters — a bucket of B
    docs yields B² candidate pairs, quadratic blow-up at web scale) are
    dropped when larger than ``max_bucket``: identical texts are already
    caught by :func:`exact_dedup`, and a >max_bucket near-dup cluster is
    boilerplate by definition. The drop is an anti-join against the small
    set of oversized (band, bucket) keys, so no skewed shuffle either.
    """
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice("sig", i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    if max_bucket is not None:
        oversized = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket)
        )
        banded = banded.join(
            F.broadcast(oversized.select("band", "bucket")),
            ["band", "bucket"],
            "left_anti",
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_jaccard_estimate(
    sigs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Estimated Jaccard = fraction of equal signature slots per pair."""
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sb"))
    eq = F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.aggregate(eq, F.lit(0), lambda acc, v: acc + v)
                / F.size("_sa")
            ).alias("jaccard_est"),
        )
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Near-duplicate pairs above an estimated-Jaccard threshold."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k)
    cand = minhash_lsh_candidates(sigs, id_col, bands, num_hashes // bands, max_bucket)
    est = minhash_jaccard_estimate(sigs, cand, id_col)
    return est.filter(F.col("jaccard_est") >= threshold)


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_k: int = 5
) -> DataFrame:
    """64-bit SimHash per document (Charikar): sign of the per-bit sum of
    shingle-hash bit vectors."""

    def batch(it):
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in it:
            fps = []
            for text in pdf[text_col]:
                sh = _shingle_hashes(text or "", shingle_k)
                bits = (sh[:, None] >> bit_idx[None, :]) & np.uint64(1)
                score = bits.sum(axis=0) * 2 - sh.size  # +1/-1 votes
                fp = np.uint64(0)
                for i in np.flatnonzero(score > 0):
                    fp |= np.uint64(1) << np.uint64(i)
                fps.append(np.int64(fp.astype(np.int64)))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": fps})

    return docs.select(id_col, text_col).mapInPandas(
        batch, schema=f"{id_col} long, simhash long"
    )


def simhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    shingle_k: int = 5,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Candidate generation: split the 64-bit fingerprint into
    (max_hamming+1) chunks — a pair within the hamming budget must agree
    exactly on at least one chunk (pigeonhole) — then verify with
    bit_count. Equi-join on (chunk_idx, chunk_value): no cross join.
    Degenerate (chunk_idx, chunk_val) buckets above ``max_bucket`` are
    dropped like in :func:`minhash_lsh_candidates` — quadratic-bucket
    guard for boilerplate clusters.
    """
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    fps = simhash_fingerprints(docs, id_col, text_col, shingle_k)
    chunk_vals = F.array(
        *[
            (F.shiftrightunsigned("simhash", i * width) % F.lit(2**width)).cast(
                "long"
            )
            for i in range(n_chunks)
        ]
    )
    chunks = fps.select(
        id_col,
        "simhash",
        F.posexplode(chunk_vals).alias("chunk_idx", "chunk_val"),
    )
    if max_bucket is not None:
        oversized = (
            chunks.groupBy("chunk_idx", "chunk_val")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket)
        )
        chunks = chunks.join(
            F.broadcast(oversized.select("chunk_idx", "chunk_val")),
            ["chunk_idx", "chunk_val"],
            "left_anti",
        )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("_fa"),
            F.col("b.simhash").alias("_fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact verification)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given candidate pairs.

    Set algebra via exploded n-gram rows + aggregates: |A∩B| from a join
    on gram, |A∪B| = |A|+|B|−|A∩B| — no per-pair Python.
    """
    words = F.split(normalized_text(F.col(text_col)), " ")
    grams = docs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(words) - n + 1, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(words, i, n)),
            )
        ).alias("gram"),
    ).distinct()
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    ga = grams.select(F.col(id_col).alias("id_a"), "gram")
    gb = grams.select(F.col(id_col).alias("id_b"), "gram")
    inter = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .fillna({"_inter": 0})
        .join(sizes.withColumnsRenamed({id_col: "id_a", "_sz": "_sza"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "_sz": "_szb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter")
                / (F.col("_sza") + F.col("_szb") - F.col("_inter"))
            ).alias("jaccard"),
        )
    )
