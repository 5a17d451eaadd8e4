"""Distributed BPE (byte-pair encoding) vocabulary training.

The missing piece between token COUNTING (operators/textstats) and a
training pipeline: learning the subword vocabulary itself. Classic
Sennrich-style BPE over the word-frequency table:

1. words → char-symbol sequences, weighted by corpus frequency;
2. repeat: count adjacent symbol pairs (at every position, i.e.
   overlapping), merge the most frequent pair everywhere
   (left-to-right, non-overlapping), stop after ``n_merges`` or when
   the best pair drops below ``min_count``.

Distribution shape: the corpus is scanned ONCE (word count — the same
shuffle as token_stats); every merge iteration then runs over the
DISTINCT-WORD table, which is orders of magnitude smaller than the
corpus and cached. Each iteration is one hash aggregate (pair counts,
map-side combined) + one narrow map (merge application) — the argmax
row is the only thing the driver sees. At web scale the distinct-word
table is itself pruned by ``min_word_freq`` (hapax legomena carry no
merge signal), the standard practice for trillion-token vocab runs.

The merge application is a pure Catalyst ``aggregate`` fold over the
symbol array — JVM whole-stage expression, NO Python UDF — carrying
(emitted symbols, pending symbol) state so repeated pairs merge
left-to-right non-overlapping ("aaaa" + merge(a,a) → "aa","aa").

Determinism: ties on pair count break lexicographically on (left,
right), so the learned merge list is a pure function of the corpus —
the pytest oracle is an independent scalar implementation of the same
spec (tests/test_bpe.py); the driver registers the merge table
rows-only (an iterative global argmax is not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["word_freq_table", "train_bpe", "encode_word", "bpe_token_counts"]


def word_freq_table(
    docs: DataFrame, text_col: str = "text", min_word_freq: int = 1
) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the one
    corpus-wide scan."""
    w = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
    return (
        docs.select(w)
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= int(min_word_freq))
    )


def _merge_expr(sym, a: str, b: str):
    """Catalyst fold applying merge (a,b)→ab left-to-right
    non-overlapping over a symbol array column."""
    ab = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(st, s):
        out, prev = st.getField("out"), st.getField("prev")
        hit = prev.isNotNull() & (prev == F.lit(a)) & (s == F.lit(b))
        return (
            F.when(
                hit,
                F.struct(
                    F.concat(out, F.array(F.lit(ab))).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .when(
                prev.isNull(),
                F.struct(out.alias("out"), s.alias("prev")),
            )
            .otherwise(
                F.struct(
                    F.concat(out, F.array(prev)).alias("out"), s.alias("prev")
                )
            )
        )

    def finish(st):
        out, prev = st.getField("out"), st.getField("prev")
        return F.when(prev.isNull(), out).otherwise(F.concat(out, F.array(prev)))

    return F.aggregate(sym, init, step, finish)


def _train_bpe_local(
    wc_rows: list, n_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    """Driver-local merge loop over a collected (word, freq) table —
    identical spec to the distributed loop (tested equal). This is the
    fast path: real vocab trainers (subword-nmt onward) run the merge
    loop over the distinct-word dict because it is orders of magnitude
    smaller than the corpus; only the corpus scan needs the cluster."""
    from collections import Counter

    wc = {r["w"]: r["freq"] for r in wc_rows}
    segs = {w: list(w) for w in wc}
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        pc: Counter = Counter()
        for w, c in wc.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b, int(cnt)))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def train_bpe(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
    min_count: int = 2,
    min_word_freq: int = 1,
    local_threshold: int = 2_000_000,
    force_distributed: bool = False,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merges; returns [(left, right, count), ...] in
    merge order.

    The corpus scan (word counting) is always distributed; the merge
    loop runs driver-local when the distinct-word table has at most
    ``local_threshold`` rows (it fits trivially — the table is words,
    not tokens) and distributed otherwise. Both loops implement the
    same spec and are tested equal (test_bpe.py)."""
    wc = word_freq_table(docs, text_col, min_word_freq)
    if not force_distributed and wc.count() <= local_threshold:
        return _train_bpe_local(wc.collect(), n_merges, min_count)
    chars = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    seg = wc.select(F.col("freq"), chars.alias("sym")).cache()
    seg.count()
    pairs_expr = F.when(
        F.size("sym") > 1,
        F.expr(
            "transform(sequence(1, size(sym) - 1), "
            "i -> struct(sym[i - 1] AS l, sym[i] AS r))"
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        best = (
            seg.select("freq", F.explode(pairs_expr).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        new_seg = seg.select(
            "freq", _merge_expr(F.col("sym"), a, b).alias("sym")
        ).cache()
        new_seg.count()
        seg.unpersist()
        seg = new_seg
    seg.unpersist()
    return merges


def encode_word(word: str, ranks: dict) -> list[str]:
    """Encode ONE word with learned merges: repeatedly merge the
    lowest-rank adjacent pair present (left-to-right non-overlapping per
    sweep) until none applies — the classic BPE encode. Encoding a
    training-corpus word reproduces its final training segmentation
    exactly (tested)."""
    s = list(word)
    while len(s) > 1:
        best_rank, best_pair = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (s[i], s[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_token_counts(
    spark: SparkSession,
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token counts with a learned merge list.

    Distributed shape: the corpus explodes to words ONCE; the expensive
    per-word encode runs over the DISTINCT words only (a pandas-batch
    kernel over the small word table — same asymmetry the trainer
    exploits), then a broadcast join maps every corpus word to its
    token count. Output: id_col + (n_words, n_tokens)."""
    import pandas as pd

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    b_ranks = spark.sparkContext.broadcast(ranks)

    def kern(batches):
        r = b_ranks.value
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_tok"] = [len(encode_word(w, r)) for w in pdf["w"]]
            yield pdf

    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    distinct = words.select("w").distinct()
    encoded = distinct.mapInPandas(kern, "w string, n_tok long")
    # r6: no forced broadcast — on a web-scale corpus the distinct-word
    # table (URLs, typos, code) runs to 10⁸-10⁹ rows, far past broadcast
    # limits. AQE picks the strategy from the RUNTIME size of the encode
    # stage: small word tables still become a broadcast join (verified in
    # the plan gate), huge ones stay a shuffled join instead of OOMing
    # the driver.
    return (
        words.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
