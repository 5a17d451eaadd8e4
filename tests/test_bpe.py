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
