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


#: regime switch for the signature kernels: batches of SHORT documents
#: (the web-scale hot case — the per-document Python loop dominates
#: there) go through the fully-batched byte-concat kernels below;
#: batches of long documents keep the per-document numpy path, whose
#: working set stays cache-resident and measures faster on large docs
_BATCH_KERNEL_MAX_DOC_BYTES = 256


def _mean_doc_bytes(texts) -> float:
    n = len(texts)
    return sum(len(t or "") for t in texts) / max(n, 1)


#: window-chunk size for the batched segment reductions — small enough
#: that the (chunk × 64) uint64 working set (~512 KB) stays L2-resident
#: and the reused buffer avoids large-allocation page faults (r6 sweep
#: over 256/512/1024/2048/4096: 1024 ≈ 512 within noise, both ~2× the
#: old 4096 on the minhash kernel — the 2 MB buffer spilled L2)
_SIG_CHUNK = 1024


def _batch_shingle_hashes(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All documents' DISTINCT k-byte shingle hashes in one vectorized
    pass over the whole Arrow batch (no per-document Python loop).

    Byte-concatenates the batch with an offsets array, computes the
    sliding FNV-style window hash with k shifted adds over the single
    concatenated array, masks windows that cross document boundaries,
    then dedups per document with one lexsort. Returns ``(hashes,
    starts)`` where ``hashes[starts[d]:starts[d+1]]`` are document d's
    sorted distinct hashes — per-document output identical to
    :func:`_shingle_hashes`."""
    bufs, lens = [], []
    for t in texts:
        b = (t or "").lower().encode("utf-8", "ignore")
        if len(b) < k:
            b = b + b"\x00" * (k - len(b))
        bufs.append(b)
        lens.append(len(b))
    lens = np.asarray(lens, dtype=np.int64)
    arr = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    n_docs = lens.size
    ends = np.cumsum(lens)
    offs = ends - lens
    mult = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    nw = arr.size - k + 1
    h = np.zeros(nw, dtype=np.uint64)
    for j in range(k):  # k shifted adds, not an (nw, k) matrix
        h += arr[j : j + nw] * mult[j]
    wcounts = lens - k + 1  # >= 1 per doc (padded above)
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), wcounts)
    base = np.repeat(offs - (np.cumsum(wcounts) - wcounts), wcounts)
    hv = h[np.arange(doc_ids.size, dtype=np.int64) + base]
    order = np.lexsort((hv, doc_ids))
    dv, hh = doc_ids[order], hv[order]
    keep = np.ones(hh.size, dtype=bool)
    keep[1:] = (dv[1:] != dv[:-1]) | (hh[1:] != hh[:-1])
    dv, hh = dv[keep], hh[keep]
    starts = np.concatenate(
        [[0], np.cumsum(np.bincount(dv, minlength=n_docs))]
    ).astype(np.int64)
    return hh, starts


def _segment_chunks(starts: np.ndarray, size: int):
    """Yield (slice, reduceat-indices, segment-ids) triples that cover
    [0, size) in ``_SIG_CHUNK`` pieces aligned to nothing — segments
    spanning a boundary are combined by the caller's accumulate."""
    for s in range(0, size, _SIG_CHUNK):
        e = min(s + _SIG_CHUNK, size)
        d0 = int(np.searchsorted(starts, s, side="right") - 1)
        internal = starts[(starts > s) & (starts < e)] - s
        red = np.concatenate([[0], internal]).astype(np.int64)
        yield slice(s, e), red, np.arange(d0, d0 + red.size)


def _minhash_from_batch(
    hh: np.ndarray, starts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, num_hashes) minhash matrix via chunked segment-min
    (``np.minimum.reduceat``) — one BLAS-shaped pass per chunk."""
    n_docs = starts.size - 1
    out = np.full((n_docs, a.size), np.iinfo(np.uint64).max, dtype=np.uint64)
    m = np.uint64(_MERSENNE)
    buf = np.empty((_SIG_CHUNK, a.size), dtype=np.uint64)
    tmp = np.empty_like(buf)
    for sl, red, segs in _segment_chunks(starts, hh.size):
        n = sl.stop - sl.start
        vals, hi = buf[:n], tmp[:n]
        np.multiply(hh[sl, None], a[None, :], out=vals)
        vals += b[None, :]
        # x % (2^61-1) without division (Mersenne): x = q·2^61 + r with
        # q ≤ 7, r ≤ M → (q + r) needs at most one subtract of M. Exact
        # for any uint64 x, so identical to the reference `% M`.
        np.right_shift(vals, np.uint64(61), out=hi)
        vals &= m
        vals += hi
        np.subtract(vals, m, out=hi)  # wraps to huge when vals < M
        np.minimum(vals, hi, out=vals)  # = vals-M if vals >= M else vals
        out[segs] = np.minimum(out[segs], np.minimum.reduceat(vals, red, axis=0))
    return out.astype(np.int64)


def _simhash_from_batch(hh: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """(n_docs,) SimHash fingerprints via chunked per-bit segment-sum
    (``np.add.reduceat``) + one vectorized bit-pack.

    Bit expansion uses ``np.unpackbits`` over the uint64s' little-endian
    byte view (bitorder='little' ⇒ column j == bit j of the hash, i.e.
    ``(h >> j) & 1`` — exactly the old 64-shift loop, verified equal),
    one C call writing uint8 instead of 64 uint64 shift passes: ~2×."""
    n_docs = starts.size - 1
    bit_idx = np.arange(64, dtype=np.uint64)
    cnt = np.zeros((n_docs, 64), dtype=np.int64)
    for sl, red, segs in _segment_chunks(starts, hh.size):
        bits = np.unpackbits(
            hh[sl].view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        # int32 intermediate: reduceat keeps the input dtype, and uint8
        # would wrap past 255 shingles; a segment is < _SIG_CHUNK < 2^15
        cnt[segs] += np.add.reduceat(bits.astype(np.int32), red, axis=0)
    score = cnt * 2 - np.diff(starts)[:, None]
    fp = ((score > 0).astype(np.uint64) << bit_idx[None, :]).sum(axis=1)
    return fp.astype(np.int64)


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
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: pdf[id_col], "sig": []})
                continue
            if _mean_doc_bytes(pdf[text_col]) <= _BATCH_KERNEL_MAX_DOC_BYTES:
                hh, starts = _batch_shingle_hashes(pdf[text_col], shingle_k)
                mat = _minhash_from_batch(hh, starts, a, b)
                sigs = list(mat)
            else:  # long docs: per-doc arrays stay cache-resident
                m = np.uint64(_MERSENNE)
                sigs = []
                for text in pdf[text_col]:
                    sh = _shingle_hashes(text or "", shingle_k)
                    vals = (sh[:, None] * a[None, :] + b[None, :]) % m
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
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: pdf[id_col], "simhash": []})
                continue
            if _mean_doc_bytes(pdf[text_col]) <= _BATCH_KERNEL_MAX_DOC_BYTES:
                hh, starts = _batch_shingle_hashes(pdf[text_col], shingle_k)
                fps = _simhash_from_batch(hh, starts)
            else:
                fps = []
                for text in pdf[text_col]:
                    sh = _shingle_hashes(text or "", shingle_k)
                    cnt = ((sh[:, None] >> bit_idx[None, :]) & np.uint64(1)).sum(
                        axis=0
                    )
                    # SIGNED score (uint64 math would wrap for bits seen in
                    # fewer than half the shingles → near-all-ones garbage)
                    score = cnt.astype(np.int64) * 2 - np.int64(sh.size)
                    fps.append(
                        ((score > 0).astype(np.uint64) << bit_idx)
                        .sum()
                        .astype(np.int64)
                    )
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
