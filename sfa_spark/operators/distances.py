"""Distance operators + the index-style lower-bound-then-verify k-NN.

Reference mapping (SURVEY.md §2.6):
* J2 1-NN Euclidean whole-series — full scan, vectorized matrix form.
* J4 SFA lower-bounding distance (transformation/SFADistance.java:22-67):
  per-symbol distance to the query's DFT values through the bin edges,
  0 when symbols match, ×2 for conjugate symmetry, DC handled separately
  when un-normed. Lower-bounds true ED (EDBT'12).
* K3 trie best-first search — replaced by the Spark-native two-phase
  shape: a cheap LB filter stage prunes candidates, then exact ED top-k
  (K2) on the survivors. The reference's SFATrie MBR pruning corresponds
  to partition-level min/max stats; here the LB itself does the pruning
  and the index artifact is the candidates' SFA words (a compact column).

All kernels numpy; the Spark layer broadcasts the query and scans
candidates with mapInPandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sfa_spark.transform import mft as _mft
from sfa_spark.transform.sfa import SFAModel


def euclidean_1nn(corpus: np.ndarray, queries: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact squared-ED 1-NN, full scan: (n_q,) indices + distances."""
    d = (
        (queries**2).sum(axis=1)[:, None]
        - 2.0 * queries @ corpus.T
        + (corpus**2).sum(axis=1)[None, :]
    )
    nn = d.argmin(axis=1)
    return nn, np.maximum(d[np.arange(len(queries)), nn], 0.0)


def sfa_lower_bound(
    words_ts: np.ndarray,
    words_query: np.ndarray,
    dft_query: np.ndarray,
    bins: np.ndarray,
    normed: bool,
) -> np.ndarray:
    """Vectorized SFADistance.getDistance over many candidate words.

    words_ts: (n, l) candidate SFA words; words_query: (l,) query word;
    dft_query: (l,) query DFT values; bins: (l, α-1).
    """
    words_ts = np.asarray(words_ts, dtype=np.int64)
    n, l = words_ts.shape
    wq = np.asarray(words_query, dtype=np.int64)[None, :]
    dq = np.asarray(dft_query, dtype=np.float64)[None, :]

    # dist(c1, c2, realC2, dim): 0 if equal; c1>c2 → bins[dim][c1-1]-realC2
    #                            else realC2 - bins[dim][c1]
    gt = words_ts > wq
    lt = words_ts < wq
    idx_hi = np.clip(words_ts - 1, 0, bins.shape[1] - 1)
    idx_lo = np.clip(words_ts, 0, bins.shape[1] - 1)
    per = np.zeros((n, l))
    cols = np.arange(l)[None, :].repeat(n, axis=0)
    per[gt] = bins[cols[gt], idx_hi[gt]] - dq.repeat(n, axis=0)[gt]
    per[lt] = dq.repeat(n, axis=0)[lt] - bins[cols[lt], idx_lo[lt]]

    start = 0
    total = np.zeros(n)
    if not normed:
        total = per[:, 0] ** 2
        start = 2
    total = total + 2.0 * (per[:, start:] ** 2).sum(axis=1)
    return total


def lb_knn_search(
    model: SFAModel,
    corpus: np.ndarray,
    corpus_words: np.ndarray,
    query: np.ndarray,
    k: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Two-phase exact k-NN: SFA lower bound prunes, exact ED verifies.

    Returns (indices, squared distances) — identical results to the full
    scan (the LB property guarantees no false dismissals), with the LB
    pass replacing the reference trie's best-first node expansion
    (index/SFATrie.java:593-660).
    """
    from sfa_spark.transform.sfa import quantize

    dft_q = _mft.transform(
        np.asarray(query, dtype=np.float64),
        model.window_size,
        model.word_length,
        model.norm_mean,
        model.lower_bounding,
    )
    word_q = quantize(dft_q[None, :], model.bins)[0]

    lb = sfa_lower_bound(corpus_words, word_q, dft_q, model.bins, model.norm_mean)

    # phase 2: expand candidates in LB order until the kth-best exact
    # distance is below the next LB (no false dismissals)
    order = np.argsort(lb, kind="stable")
    best_d = np.full(k, np.inf)
    best_i = np.full(k, -1)
    for pos, idx in enumerate(order):
        if lb[idx] >= best_d[-1]:
            break
        d = float(((corpus[idx] - query) ** 2).sum())
        if d < best_d[-1]:
            j = np.searchsorted(best_d, d)
            best_d = np.insert(best_d, j, d)[:k]
            best_i = np.insert(best_i, j, idx)[:k]
    return best_i, best_d


def lb_knn_search_df(spark, model: SFAModel, corpus_df, query: np.ndarray, k: int = 1):
    """Distributed two-phase k-NN: per-partition LB prune + local top-k,
    then global top-k of the partition winners (tiny). corpus_df:
    (series_id long, series array<double>, word array<smallint>)."""
    model_dict = model.to_dict()
    q = query.tolist()

    def per_part(batches):
        m = SFAModel.from_dict(model_dict)
        qv = np.asarray(q)
        dft_q = _mft.transform(qv, m.window_size, m.word_length, m.norm_mean, m.lower_bounding)
        from sfa_spark.transform.sfa import quantize

        word_q = quantize(dft_q[None, :], m.bins)[0]
        for pdf in batches:
            if pdf.empty:
                continue
            words = np.stack(pdf["word"].to_numpy()).astype(np.int64)
            lb = sfa_lower_bound(words, word_q, dft_q, m.bins, m.norm_mean)
            order = np.argsort(lb, kind="stable")
            best = []  # (d, series_id)
            worst = np.inf
            for idx in order:
                if len(best) >= k and lb[idx] >= worst:
                    break
                s = np.asarray(pdf["series"].iloc[idx], dtype=np.float64)
                d = float(((s - qv) ** 2).sum())
                if len(best) < k or d < worst:
                    best.append((d, int(pdf["series_id"].iloc[idx])))
                    best.sort()
                    best = best[:k]
                    worst = best[-1][0]
            yield pd.DataFrame(
                {"series_id": [b[1] for b in best], "dist": [b[0] for b in best]}
            )

    parts = corpus_df.mapInPandas(per_part, schema="series_id long, dist double")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    w = W.orderBy(F.asc("dist"), F.asc("series_id"))
    return parts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
