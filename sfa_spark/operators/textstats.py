"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All built-in-function compositions (JVM-side,
codegen) except the rolling-hash fingerprint, which is a vectorized numpy
kernel over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic —
# enough to separate the generator/test languages deterministically
_LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "that", "with", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "de", "des", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "es", "una", "por"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "non", "sono"],
}

_STOPWORDS_EN = set(_LANG_PROFILES["en"]) | {
    "a", "an", "it", "on", "as", "at", "by", "be", "are", "or", "this",
}


def tokens(col) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")), " ")


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count: split on the GPT-2-style boundary regex
    (word / number / punctuation runs). A deterministic stand-in for a
    real BPE vocabulary."""
    return F.size(
        F.filter(
            F.split(col, r"(?=\s)|(?<=\s)|(?=[^\w\s])|(?<=[^\w\s])"),
            lambda t: F.trim(t) != "",
        )
    )


def lang_id(col) -> Column:
    """Stopword-profile language guess: argmax over per-language hit
    counts of the token set (case-folded). Pure built-ins: one struct-max
    over literal arrays — no UDF, no shuffle."""
    toks = tokens(col)
    scores = [
        F.struct(
            F.size(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(*[F.lit(w) for w in words]),
                )
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(_LANG_PROFILES.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: lengths, punctuation/digit/stopword
    ratios, mean word length, repetition ratio."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    stop_hits = F.size(
        F.filter(toks, lambda w: w.isin(*[F.lit(s) for s in _STOPWORDS_EN]))
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    return docs.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tok.alias("q_n_tokens"),
        (
            F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")) / F.greatest(n_chars, F.lit(1))
        ).alias("q_punct_ratio"),
        (
            F.length(F.regexp_replace(t, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1))
        ).alias("q_digit_ratio"),
        (stop_hits / F.greatest(n_tok, F.lit(1))).alias("q_stopword_ratio"),
        (n_chars / F.greatest(n_tok, F.lit(1))).alias("q_mean_word_len"),
        distinct_ratio.alias("q_distinct_token_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: a fixed, documented combination of
    the features (monotone heuristics, not a trained model)."""
    feat = quality_features(docs, text_col)
    len_term = F.least(F.col("q_n_tokens") / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(F.col("q_stopword_ratio") * 4, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - F.col("q_punct_ratio") * 5, F.lit(0.0))
    digit_pen = F.greatest(F.lit(1.0) - F.col("q_digit_ratio") * 5, F.lit(0.0))
    rep_term = F.col("q_distinct_token_ratio")
    return feat.withColumn(
        "quality",
        F.round(
            (len_term + stop_term + rep_term) / 3 * punct_pen * digit_pen, 6
        ),
    )


def rolling_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    keep: int = 8,
) -> DataFrame:
    """Document fingerprint: the ``keep`` smallest rolling (Rabin-Karp
    style) hashes over byte windows — a winnowing-flavored sketch usable
    for containment/overlap detection. Vectorized numpy per Arrow batch."""
    base = np.uint64(1099511628211)

    def batch(it):
        powers = base ** np.arange(window, dtype=np.uint64)
        for pdf in it:
            fps = []
            for text in pdf[text_col]:
                b = np.frombuffer(
                    (text or "").encode("utf-8", "ignore"), dtype=np.uint8
                )
                if b.size < window:
                    h = (b.astype(np.uint64) * powers[: b.size]).sum() if b.size else np.uint64(0)
                    fps.append([int(np.int64(h))])
                    continue
                win = np.lib.stride_tricks.sliding_window_view(b, window)
                hashes = (win.astype(np.uint64) * powers[None, :]).sum(axis=1)
                smallest = np.unique(hashes)[:keep]
                fps.append([int(x) for x in smallest.astype(np.int64)])
            yield pd.DataFrame({id_col: pdf[id_col], "fingerprint": fps})

    return docs.select(id_col, text_col).mapInPandas(
        batch, schema=f"{id_col} long, fingerprint array<long>"
    )
