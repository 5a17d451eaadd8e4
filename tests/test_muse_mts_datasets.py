"""MUSE + the multivariate loader on more of the reference's bundled MTS
datasets (round-2 verdict item: only ShapesRandom was exercised).

PenDigits and ECG run the full MUSE grid with accuracy floors below the
scores the reference family reports (WEASEL+MUSE paper, table 1:
PenDigits ≈ 0.912, ECG ≈ 0.88 — probes on this engine measured 0.93 and
0.89). JapaneseVowels (12 ragged dims, lengths 6..26 — the loader's
hardest bundled case) exercises the loader + the per-window word/bag
layer; its full classifier grid is too slow for the suite (documented).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from sfa_spark.classifiers import accuracy
from sfa_spark.muse import MAX_F, _bags, _fit_window_sfa, _words, fit_muse, predict_muse
from sfa_spark.sources import load_multivariate_numpy
from sfa_spark.transform import sfa as _sfa

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name, derivatives=True):
    tr, ytr = load_multivariate_numpy(
        os.path.join(FIX, f"{name}_TRAIN3"), derivatives=derivatives
    )
    te, yte = load_multivariate_numpy(
        os.path.join(FIX, f"{name}_TEST3"), derivatives=derivatives
    )
    return tr, np.asarray(ytr, dtype=np.float64), te, np.asarray(yte, dtype=np.float64)


def test_pendigits_loader_and_muse_floor(spark):
    tr, ytr, te, yte = _load("PenDigits")
    assert len(tr) == 300 and len(te) == 10692
    assert len(tr[0]) == 4  # 2 dims + 2 derivative channels
    lens = {len(d) for dims in tr for d in dims}
    assert lens == {7, 8}  # derivative channels are one shorter
    model = fit_muse(spark, tr, ytr)
    assert accuracy(predict_muse(model, tr), ytr) >= 0.95
    te, yte = te[:500], yte[:500]
    assert accuracy(predict_muse(model, te), yte) >= 0.85  # probe: 0.93


def test_ecg_loader_and_muse_floor(spark):
    tr, ytr, te, yte = _load("ECG")
    assert len(tr) == len(te) == 100
    assert len(tr[0]) == 4
    # variable-length series within one dataset (53..147)
    lens = [len(dims[0]) for dims in tr]
    assert min(lens) < max(lens)
    model = fit_muse(spark, tr, ytr)
    assert accuracy(predict_muse(model, tr), ytr) >= 0.95
    assert accuracy(predict_muse(model, te), yte) >= 0.80  # probe: 0.89


def test_japanesevowels_loader_and_word_layer():
    """12 ragged dims (lengths 6..26), 9 classes, 24 channels with
    derivatives — the loader's hardest bundled case. The full MUSE grid
    is exercised on PenDigits/ECG (above); here the fit→words→bags layer
    runs at one window length and must produce sane, non-degenerate
    features for every sample including those SHORTER than the window
    (empty word arrays, MUSE.java:132-136)."""
    tr, ytr, te, yte = _load("JapaneseVowels")
    assert len(tr) == 270 and len(te) == 370
    assert len(tr[0]) == 24
    assert len(set(ytr)) == 9
    lens = [len(d) for dims in tr for d in dims]
    assert min(lens) >= 5 and max(lens) <= 26
    # per-sample dims are consistent within a sample (id grouping)
    for dims in tr[:20]:
        base = {len(d) for d in dims[0::2]}
        assert len(base) == 1

    w = 8
    model = _fit_window_sfa(tr, w, True, _sfa.EQUI_DEPTH)
    words = [
        [_words(model, np.asarray(d, dtype=np.float64)) for dims in tr for d in dims]
    ]
    # series shorter than the window yield empty word arrays, not errors
    n_empty = sum(1 for ws in words[0] if ws.size == 0)
    assert n_empty > 0
    bags = _bags(words, [w], 24, 4)
    assert len(bags) == 270
    # a sample whose EVERY channel is shorter than the window has no
    # windows to word — its bag is empty by construction (the reference
    # emits zero words for it too, MUSE.java:132-136); all others have
    # at least one feature
    expected_nonempty = sum(1 for dims in tr if any(len(d) >= w for d in dims))
    non_empty = [b for b in bags if b]
    assert len(non_empty) == expected_nonempty
    assert 0 < expected_nonempty <= 270
    # features are content-keyed MuseWord tuples
    k = next(iter(non_empty[0]))
    assert len(k) == 4 and k[0] == 0 and 0 <= k[1] < 24
