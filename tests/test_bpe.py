"""BPE training vs an independent scalar implementation of the same
spec (overlapping pair counts, left-to-right non-overlapping merge,
count-then-lexicographic tie-break)."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from sfa_spark.operators.bpe import train_bpe


def scalar_bpe(texts, n_merges, min_count=2, min_word_freq=1):
    wc = Counter()
    for t in texts:
        for w in t.lower().split():
            wc[w] += 1
    wc = {w: c for w, c in wc.items() if c >= min_word_freq}
    segs = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, c in wc.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        for w in segs:
            s = segs[w]
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


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "lowered lower lowest low low low slower slowest",
    "aaaa aaaa aaaa banana bandana ananas",
    "the the the them theme anthem",
]


def test_distributed_loop_matches_scalar_reference(spark):
    docs = spark.createDataFrame(pd.DataFrame({"text": TEXTS}))
    got = train_bpe(spark, docs, n_merges=8, min_count=2, force_distributed=True)
    want = scalar_bpe(TEXTS, 8, min_count=2)
    assert got == want
    assert len(got) == 8  # genuinely trained, not empty


def test_local_fast_path_equals_distributed_spec(spark):
    docs = spark.createDataFrame(pd.DataFrame({"text": TEXTS}))
    got = train_bpe(spark, docs, n_merges=25, min_count=2)  # local path
    want = scalar_bpe(TEXTS, 25, min_count=2)
    assert got == want
    assert len(got) > 10


def test_repeated_symbol_merges_non_overlapping(spark):
    # "aaaa": merge (a,a) counts 3 overlapping positions but applies
    # non-overlapping -> "aa","aa"; next merge is (aa,aa)
    docs = spark.createDataFrame(pd.DataFrame({"text": ["aaaa aaaa aaaa"]}))
    got = train_bpe(spark, docs, n_merges=2, min_count=1, force_distributed=True)
    want = scalar_bpe(["aaaa aaaa aaaa"], 2, min_count=1)
    assert got == want
    assert got[0][:2] == ("a", "a")
    assert got[1][:2] == ("aa", "aa")


def test_min_count_stops_training(spark):
    docs = spark.createDataFrame(pd.DataFrame({"text": ["ab cd ef"]}))
    got = train_bpe(spark, docs, n_merges=10, min_count=2)
    assert got == []  # every pair occurs once


def test_min_word_freq_prunes_tail(spark):
    texts = ["zz zz zz zz rareword", "zz zz zz"]
    docs = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = train_bpe(spark, docs, n_merges=5, min_count=1, min_word_freq=2)
    want = scalar_bpe(texts, 5, min_count=1, min_word_freq=2)
    assert got == want
    assert all("r" not in a and "r" not in b for a, b, _ in got)


def scalar_bpe_with_segs(texts, n_merges, min_count=2):
    """Scalar reference that also returns the final segmentations."""
    wc = Counter()
    for t in texts:
        for w in t.lower().split():
            wc[w] += 1
    segs = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, c in wc.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        for w in segs:
            s = segs[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_encode_reproduces_training_segmentation(spark):
    """The classic BPE property: greedy rank-order encoding of a
    training-corpus word yields exactly its final training
    segmentation."""
    from sfa_spark.operators.bpe import encode_word

    merges, segs = scalar_bpe_with_segs(TEXTS, 25, min_count=2)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w, seg in segs.items():
        assert encode_word(w, ranks) == seg, w


def test_token_counts_end_to_end(spark):
    from sfa_spark.operators.bpe import bpe_token_counts, train_bpe

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    merges = train_bpe(spark, docs, n_merges=25, min_count=2)
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_token_counts(spark, docs, merges).collect()
    }
    _, segs = scalar_bpe_with_segs(TEXTS, 25, min_count=2)
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        want_tokens = sum(len(segs[w]) for w in words)
        assert got[i] == (len(words), want_tokens), i
    # merging strictly reduces token count vs chars, never below words
    for i, t in enumerate(TEXTS):
        n_chars = sum(len(w) for w in t.lower().split())
        assert got[i][0] <= got[i][1] < n_chars
