"""Distributed SFA over long tables — the Spark-first pipeline.

Shape (SURVEY.md §3.1 mapping): the reference runs fit in one JVM; here

  stage 1  per-series Arrow kernel (applyInPandas): disjoint windows →
           z-norm → DFT approximation → emit (coef, rounded value) rows
  stage 2  ONE shuffle regroups by coefficient; per-coefficient exact sort
           + MCB edge fit (the orderline is bounded: it's the training
           sample, and each coefficient's edges collapse to α-1 doubles)
  stage 3  the (l × α-1) bins matrix — a few hundred bytes — is collected
           and broadcast; transform is then embarrassingly parallel per
           series (no further shuffle).

At 100 TB the fit runs on a bounded training sample (reference semantics:
bins are fit once, then reused), so stage 2's exact per-coefficient sort is
cheap; the transform stage is the bulk work and is shuffle-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sfa_spark.transform import mft as _mft
from sfa_spark.transform import sfa as _sfa
from sfa_spark.transform.sfa import SFAModel


def fit_windowing_df(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    window_size: int,
    word_length: int,
    alphabet_size: int,
    norm_mean: bool,
    lower_bounding: bool = True,
    histogram_type: str = _sfa.EQUI_DEPTH,
) -> SFAModel:
    """Fit MCB bins on the disjoint windows of every series in ``df``.

    Distributed equivalent of SFA.fitWindowing (SFA.java:269-279).
    """
    wl = word_length

    def approx_per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.sort_values(t_col)[value_col].to_numpy(dtype=np.float64)
        rows = []
        for wdata in _sfa.disjoint_windows(x, window_size):
            normed = _mft.znorm(wdata, norm_mean)
            a = _mft.transform(normed, window_size, wl, norm_mean, lower_bounding)
            rows.append(_sfa.java_round2dp(a))  # SFA.java:398 fit-time rounding
        if not rows:
            return pd.DataFrame({"coef": np.array([], dtype=np.int32), "value": []})
        mat = np.stack(rows)
        n = mat.shape[0]
        return pd.DataFrame(
            {
                "coef": np.tile(np.arange(wl, dtype=np.int32), n),
                "value": mat.ravel(),
            }
        )

    orderline = df.groupBy(key_col).applyInPandas(
        approx_per_series, schema="coef int, value double"
    )

    def fit_per_coef(pdf: pd.DataFrame) -> pd.DataFrame:
        coef = int(pdf["coef"].iloc[0])
        vals = np.sort(pdf["value"].to_numpy(dtype=np.float64))
        if histogram_type == _sfa.EQUI_DEPTH:
            edges = _sfa.fit_bins_equi_depth(vals, alphabet_size)
        else:
            edges = _sfa.fit_bins_equi_width(vals, alphabet_size)
        return pd.DataFrame(
            {
                "coef": coef,
                "pos": np.arange(alphabet_size - 1, dtype=np.int32),
                "edge": edges,
            }
        )

    edges_rows = (
        orderline.repartition(word_length, "coef")
        .groupBy("coef")
        .applyInPandas(fit_per_coef, schema="coef int, pos int, edge double")
        .collect()
    )
    bins = np.full((wl, alphabet_size - 1), np.inf)
    for r in edges_rows:
        bins[r["coef"], r["pos"]] = r["edge"]
    return SFAModel(
        word_length=wl,
        alphabet_size=alphabet_size,
        norm_mean=norm_mean,
        lower_bounding=lower_bounding,
        window_size=window_size,
        histogram_type=histogram_type,
        bins=bins,
    )


def transform_windowing_df(
    df: DataFrame,
    model: SFAModel,
    key_col: str,
    t_col: str,
    value_col: str,
    pack: bool = True,
    method: str = "mft",
) -> DataFrame:
    """Every sliding window of every series → SFA word.

    Output: (key, offset, word) with ``word`` packed into a long (default)
    or an array<short>. The fitted model travels as a broadcast via the
    UDF closure (a dict of floats — tiny); no shuffle beyond the
    per-series grouping, which reuses the fit stage's partitioning.
    """
    model_dict = model.to_dict()

    if pack:
        schema = f"{key_col} long, offset int, word long"
    else:
        schema = f"{key_col} long, offset int, word array<smallint>"

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        m = SFAModel.from_dict(model_dict)
        key = pdf[key_col].iloc[0]
        x = pdf.sort_values(t_col)[value_col].to_numpy(dtype=np.float64)
        words = m.transform_windowing(x, method=method)
        out = pd.DataFrame(
            {key_col: key, "offset": np.arange(words.shape[0], dtype=np.int32)}
        )
        if pack:
            out["word"] = _sfa.pack_words(words, m.word_length, m.needed_bits)
        else:
            out["word"] = list(words)
        return out

    return df.groupBy(key_col).applyInPandas(per_series, schema=schema)


def transform_whole_df(
    df: DataFrame, model: SFAModel, key_col: str, t_col: str, value_col: str
) -> DataFrame:
    """Whole-series transform: one SFA word per series (SFA.java:125-136)."""
    model_dict = model.to_dict()

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        m = SFAModel.from_dict(model_dict)
        x = pdf.sort_values(t_col)[value_col].to_numpy(dtype=np.float64)
        word = m.transform(x)
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], "word": [word]})

    return df.groupBy(key_col).applyInPandas(
        per_series, schema=f"{key_col} long, word array<smallint>"
    )
