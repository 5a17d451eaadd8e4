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


def _series_bounds(keys: np.ndarray) -> np.ndarray:
    """Start indices of each key's contiguous run (input sorted by key)."""
    change = np.empty(keys.size, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    return np.flatnonzero(change)


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
    group_buckets: int | None = None,
    approx_rows: int | None = None,
) -> SFAModel:
    """Fit MCB bins on the disjoint windows of every series in ``df``.

    Distributed equivalent of SFA.fitWindowing (SFA.java:269-279).

    With ``group_buckets=G`` the per-series grouping is coarsened to
    ``pmod(xxhash64(key), G)`` and each pandas group batches ALL its
    series' disjoint windows through one znorm_rows+transform_rows pass —
    per-group python/Arrow overhead is paid G times, not once per series
    (the scale bottleneck at millions of keys). Identical output: the
    windows are the same rows in either grouping and the bin fit is a
    global regroup by coefficient anyway.
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

    def approx_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, t_col])
        keys = pdf[key_col].to_numpy()
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        starts = _series_bounds(keys)
        ends = np.append(starts[1:], keys.size)
        # disjoint windows are contiguous slices — one reshape per series,
        # stacked into a single (N_windows, w) matrix for the whole group
        wins = [
            vals[s : s + ((e - s) // window_size) * window_size].reshape(
                -1, window_size
            )
            for s, e in zip(starts, ends)
        ]
        wins = [w_ for w_ in wins if w_.shape[0]]
        if not wins:
            return pd.DataFrame({"coef": np.array([], dtype=np.int32), "value": []})
        stack = np.concatenate(wins, axis=0)
        normed = _mft.znorm_rows(stack, norm_mean)
        a = _mft.transform_rows(normed, window_size, wl, norm_mean, lower_bounding)
        rounded = _sfa.java_round2dp(a)
        return pd.DataFrame(
            {
                "coef": np.tile(np.arange(wl, dtype=np.int32), rounded.shape[0]),
                "value": rounded.ravel(),
            }
        )

    if group_buckets:
        grp = F.pmod(F.xxhash64(key_col), F.lit(group_buckets)).cast("int")
        orderline = df.groupBy(grp.alias("_grp")).applyInPandas(
            approx_per_group, schema="coef int, value double"
        )
    else:
        orderline = df.groupBy(key_col).applyInPandas(
            approx_per_series, schema="coef int, value double"
        )

    def _fit_edges(vals_sorted: np.ndarray) -> np.ndarray:
        if histogram_type == _sfa.EQUI_DEPTH:
            return _sfa.fit_bins_equi_depth(vals_sorted, alphabet_size)
        return _sfa.fit_bins_equi_width(vals_sorted, alphabet_size)

    # r6: when the orderline is provably small (row-count statistics are
    # exact on cached/counted inputs), collect it and fit the per-coef
    # edges in driver numpy — same sort, same edge walk, identical bins,
    # but the exchange + second python stage + per-stage AQE round-trips
    # collapse into one collect of a few-MB table. The distributed
    # per-coef path remains for unknown or large inputs (a 100 TB fit on
    # an unbounded sample keeps its exact distributed sort).
    # callers that already know the input size pass ``approx_rows`` (the
    # pipeline's tier row count rides along for free); the stats probe
    # only answers for plans whose row count survives Catalyst's
    # size-only estimator (cached leaves — a Project on top drops it)
    est_orderline = None
    if approx_rows is not None:
        est_orderline = int(approx_rows) // window_size * wl
    else:
        try:
            rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
            if rc.isDefined():
                est_orderline = int(str(rc.get())) // window_size * wl
        except Exception:
            est_orderline = None
    bins = np.full((wl, alphabet_size - 1), np.inf)
    if est_orderline is not None and est_orderline <= 2_000_000:
        pdf = orderline.toPandas()
        coefs = pdf["coef"].to_numpy()
        values = pdf["value"].to_numpy(dtype=np.float64)
        for c in range(wl):
            vals = np.sort(values[coefs == c])
            if vals.size:  # no windows at all ⇒ row stays inf, as the
                bins[c, :] = _fit_edges(vals)  # distributed path leaves it
    else:
        def fit_per_coef(pdf: pd.DataFrame) -> pd.DataFrame:
            coef = int(pdf["coef"].iloc[0])
            vals = np.sort(pdf["value"].to_numpy(dtype=np.float64))
            return pd.DataFrame(
                {
                    "coef": coef,
                    "pos": np.arange(alphabet_size - 1, dtype=np.int32),
                    "edge": _fit_edges(vals),
                }
            )

        edges_rows = (
            orderline.repartition(word_length, "coef")
            .groupBy("coef")
            .applyInPandas(fit_per_coef, schema="coef int, pos int, edge double")
            .collect()
        )
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
    group_buckets: int | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Every sliding window of every series → SFA word.

    Output: (key, carry…, offset, word) with ``word`` packed into a long
    (default) or an array<short>. The fitted model travels as a broadcast
    via the UDF closure (a dict of floats — tiny); no shuffle beyond the
    per-series grouping, which reuses the fit stage's partitioning.

    ``carry_cols`` (r6) are per-series-constant columns passed through
    the kernel (value taken from the series' first row) — callers that
    need e.g. the (url, signal) naming of a hashed series id get it for
    free instead of paying a distinct + join back onto the words (one
    aggregation and one broadcast exchange per query, measured ~0.15s
    of the headline SFA query at sf1.0).

    With ``group_buckets=G`` (same contract as :func:`fit_windowing_df`)
    each coarse pandas group segments its series, stacks equal-length
    ones and runs the windowed MFT + quantize + pack as ONE matrix pass
    per length class (mft.transform_windowing_rows — bit-identical to
    the scalar recurrence); series shorter than the window fall back to
    the scalar path inside the group.
    """
    model_dict = model.to_dict()
    carry_cols = list(carry_cols or [])
    dtypes = dict(df.dtypes)
    carry_schema = "".join(f"{c} {dtypes[c]}, " for c in carry_cols)

    if pack:
        schema = f"{key_col} long, {carry_schema}offset int, word long"
    else:
        schema = f"{key_col} long, {carry_schema}offset int, word array<smallint>"

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        m = SFAModel.from_dict(model_dict)
        key = pdf[key_col].iloc[0]
        x = pdf.sort_values(t_col)[value_col].to_numpy(dtype=np.float64)
        words = m.transform_windowing(x, method=method)
        out = pd.DataFrame({key_col: key}, index=range(words.shape[0]))
        for c in carry_cols:
            out[c] = pdf[c].iloc[0]
        out["offset"] = np.arange(words.shape[0], dtype=np.int32)
        if pack:
            out["word"] = _sfa.pack_words(words, m.word_length, m.needed_bits)
        else:
            out["word"] = list(words)
        return out

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m = SFAModel.from_dict(model_dict)
        pdf = pdf.sort_values([key_col, t_col])
        keys = pdf[key_col].to_numpy()
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        carr = {c: pdf[c].to_numpy() for c in carry_cols}
        starts = _series_bounds(keys)
        ends = np.append(starts[1:], keys.size)
        lens = ends - starts
        out_keys: list[np.ndarray] = []
        out_carr: dict[str, list[np.ndarray]] = {c: [] for c in carry_cols}
        out_off: list[np.ndarray] = []
        out_words: list = []

        def emit(i, words):  # words: (n_windows, l) symbols of series i
            out_keys.append(
                np.full(words.shape[0], keys[starts[i]], dtype=np.int64)
            )
            for c in carry_cols:
                out_carr[c].append(
                    np.full(words.shape[0], carr[c][starts[i]], dtype=object)
                )
            out_off.append(np.arange(words.shape[0], dtype=np.int32))
            if pack:
                out_words.append(
                    _sfa.pack_words(words, m.word_length, m.needed_bits)
                )
            else:
                out_words.extend(list(words))

        # r6: ONE padded matrix pass for every mft-eligible series in the
        # group, not one pass per equal-length class (series lengths are
        # nearly unique in practice, so the class loop degenerated to the
        # scalar per-series path — 546 scalar calls vs 117 matrix calls
        # in the UDF profiler). The sliding MFT recurrence, the window
        # mean/std cumsums and the quantize are all strictly per-row and
        # prefix-local (window t reads values [t, t+w) only), so the
        # first Li-w+1 outputs of a zero-padded row are BIT-identical to
        # running that series at its exact length; padded offsets are
        # sliced away. Scalar fallback stays for sub-window series, for
        # non-mft methods, and for pathological padding blow-ups.
        elig = (
            np.flatnonzero(lens >= m.window_size)
            if method == "mft"
            else np.array([], dtype=np.int64)
        )
        pad_ok = elig.size > 0 and elig.size * int(
            lens[elig].max()
        ) <= 4 * int(lens[elig].sum())
        if pad_ok:
            L = lens[elig]
            Lmax = int(L.max())
            X = np.zeros((elig.size, Lmax), dtype=np.float64)
            rowmask = np.arange(Lmax)[None, :] < L[:, None]
            X[rowmask] = np.concatenate(
                [vals[starts[i] : ends[i]] for i in elig]
            )
            approx = _mft.transform_windowing_rows(
                X, m.window_size, m.word_length, m.norm_mean, m.lower_bounding
            )
            words3 = _sfa.quantize(approx, m.bins)  # (S, Tmax, l)
            Ts = L - m.window_size + 1
            Tmax = words3.shape[1]
            offmask = np.arange(Tmax)[None, :] < Ts[:, None]
            out_keys.append(np.repeat(keys[starts[elig]], Ts))
            for c in carry_cols:
                out_carr[c].append(np.repeat(carr[c][starts[elig]], Ts))
            out_off.append(
                np.broadcast_to(
                    np.arange(Tmax, dtype=np.int32), offmask.shape
                )[offmask]
            )
            if pack:
                out_words.append(
                    _sfa.pack_words(words3, m.word_length, m.needed_bits)[
                        offmask
                    ]
                )
            else:
                out_words.extend(list(words3[offmask]))
        # everything the padded pass did not cover goes scalar: sub-window
        # series when it ran, every series when it did not (non-mft
        # method, no eligible series, or padding blow-up)
        scalar = (
            np.flatnonzero(lens < m.window_size)
            if pad_ok
            else np.arange(lens.size)
        )
        for i in scalar:
            emit(
                i,
                m.transform_windowing(vals[starts[i] : ends[i]], method=method),
            )
        out = pd.DataFrame(
            {
                key_col: np.concatenate(out_keys) if out_keys else np.array([], dtype=np.int64),
            }
        )
        for c in carry_cols:
            out[c] = (
                np.concatenate(out_carr[c]) if out_carr[c] else np.array([], dtype=object)
            )
        out["offset"] = (
            np.concatenate(out_off) if out_off else np.array([], dtype=np.int32)
        )
        out["word"] = (
            (np.concatenate(out_words) if out_words else np.array([], dtype=np.int64))
            if pack
            else out_words
        )
        return out

    if group_buckets:
        grp = F.pmod(F.xxhash64(key_col), F.lit(group_buckets)).cast("int")
        return df.groupBy(grp.alias("_grp")).applyInPandas(per_group, schema=schema)
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
