"""SFA lower-bounding distance (J4), LB-then-verify k-NN (= SFATrie oracle
equivalence, SURVEY §5 item 4), ANOVA-F supervised SFA (T10)."""

from __future__ import annotations

import numpy as np
import pytest

from sfa_spark.operators.distances import (
    euclidean_1nn,
    lb_knn_search,
    lb_knn_search_df,
    sfa_lower_bound,
)
from sfa_spark.transform import mft as _mft
from sfa_spark.transform import sfa as _sfa
from sfa_spark.transform.sfa_supervised import f_oneway, fit_transform_supervised


def walks(n, length, seed):
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.standard_normal((n, length)), axis=1)


@pytest.fixture(scope="module")
def corpus_setup():
    """Whole-series matching setup mirroring SFATrieTest.java:27-91 at
    reduced scale: z-normed walks, l=16, α=8."""
    length, l, a = 256, 16, 8
    raw = walks(300, length, 5)
    corpus = np.stack([_mft.znorm(x, True) for x in raw])
    model, words = _sfa.fit_transform(list(corpus), l, a, norm_mean=False)
    approx = np.stack(
        [_mft.transform(x, length, l, False, True) for x in corpus]
    )
    words = _sfa.quantize(approx, model.bins)
    return corpus, model, words


def test_sfa_distance_lower_bounds_ed(corpus_setup):
    """SFAMinDistanceTest.java:69: LB ≤ true ED for every pair."""
    corpus, model, words = corpus_setup
    for qi in range(0, 50, 7):
        q = corpus[qi]
        dft_q = _mft.transform(q, len(q), model.word_length, model.norm_mean, True)
        word_q = _sfa.quantize(dft_q[None, :], model.bins)[0]
        lb = sfa_lower_bound(words, word_q, dft_q, model.bins, model.norm_mean)
        ed = ((corpus - q) ** 2).sum(axis=1)
        assert (lb <= ed + 1e-6).all(), f"LB violated for query {qi}"


def test_lb_knn_equals_brute_force(corpus_setup):
    """Index k-NN == full-scan k-NN (SFATrieTest oracle, tolerance 0.003)."""
    corpus, model, words = corpus_setup
    queries = np.stack([_mft.znorm(x, True) for x in walks(5, 256, 99)])
    for q in queries:
        idx, d = lb_knn_search(model, corpus, words, q, k=3)
        full = ((corpus - q) ** 2).sum(axis=1)
        want = np.sort(full)[:3]
        np.testing.assert_allclose(np.asarray(d), want, atol=0.003)


def test_lb_knn_distributed_equals_local(spark, corpus_setup):
    corpus, model, words = corpus_setup
    q = _mft.znorm(walks(1, 256, 123)[0], True)
    rows = [
        (i, corpus[i].tolist(), words[i].tolist()) for i in range(len(corpus))
    ]
    df = spark.createDataFrame(
        rows, "series_id long, series array<double>, word array<smallint>"
    ).repartition(8)
    got = (
        lb_knn_search_df(spark, model, df, q, k=3)
        .toPandas()
        .sort_values("rank")
    )
    idx, d = lb_knn_search(model, corpus, words, q, k=3)
    np.testing.assert_allclose(got["dist"].to_numpy(), np.asarray(d), atol=1e-9)
    np.testing.assert_array_equal(got["series_id"].to_numpy(), idx)


def test_f_oneway_matches_textbook():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((20, 3)) + np.array([0.0, 2.0, 0.0])
    b = rng.standard_normal((20, 3)) + np.array([0.0, -2.0, 0.0])
    vals = np.vstack([a, b])
    labels = np.array([0.0] * 20 + [1.0] * 20)
    f = f_oneway(vals, labels)
    assert f[1] > f[0] and f[1] > f[2]
    try:
        from scipy import stats

        want = [stats.f_oneway(a[:, i], b[:, i]).statistic for i in range(3)]
        np.testing.assert_allclose(f, want, rtol=1e-9)
    except ImportError:
        pass


def test_supervised_sfa_picks_discriminative_coefficients():
    rng = np.random.default_rng(7)
    # class 0: flat noise; class 1: strong low-frequency sine
    t = np.linspace(0, 4 * np.pi, 128)
    xs, ys = [], []
    for i in range(30):
        if i % 2 == 0:
            xs.append(rng.standard_normal(128) * 0.1)
            ys.append(0.0)
        else:
            xs.append(np.sin(t) * 3 + rng.standard_normal(128) * 0.1)
            ys.append(1.0)
    model, words = fit_transform_supervised(xs, np.array(ys), 8, 8, norm_mean=True)
    assert words.shape == (30, 8)
    assert words.min() >= 0 and words.max() < 8
    # NaN-F coefficients (zero-padded slots: 0/0) rank first — a faithful
    # reproduction of the reference's Double.compareTo ordering — so the
    # separation shows up at the best FINITE-F position, not position 0
    diffs = np.abs(
        words[::2].mean(axis=0) - words[1::2].mean(axis=0)
    )
    assert diffs.max() > 1.0, f"no separating coefficient: {diffs}"
    # and the discriminative sine coefficient must be among the selected
    sep_pos = int(diffs.argmax())
    assert sep_pos < len(model.best_indices)
