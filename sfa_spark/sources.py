"""Sources: UCR dataset loader + seeded random-walk synthesis.

Spark-first re-expression of the reference loaders
(/root/reference/src/main/java/sfa/timeseries/TimeSeriesLoader.java):

* S1 ``load_ucr`` — UCR format: one sample per line, first non-empty token
  is the label, remaining whitespace-separated tokens are values, lines
  starting '@' skipped, NaN/empty tokens dropped (ragged series allowed) —
  TimeSeriesLoader.java:34-82. Output is a LONG table
  (sample_id, label, t, value): ``spark.read.text`` + split + posexplode,
  never driver-side parsing.
* S2 ``load_multivariate`` — rows `id ts label d1..dk` grouped by id;
  the explicit timestamp column is ignored like the reference
  (TimeSeriesLoader.java:112-113) — TimeSeriesLoader.java:84-138.
* S3 ``with_derivative`` — per-dim first difference appended as extra dims
  — TimeSeriesLoader.java:140-156.
* S5 ``random_walks`` — cumulative sum of seeded unit Gaussians
  (TimeSeriesLoader.java:231-242); deterministic per (series_id) via a
  hash-seeded generator inside mapInPandas (executor-side synthesis, no
  driver loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_ucr(spark: SparkSession, path: str, norm: bool = True) -> DataFrame:
    """UCR file → long DataFrame (sample_id, label, t, value).

    NaN tokens are dropped *before* positions are assigned, exactly like
    the reference (values compact left; ragged lengths possible).
    ``norm`` z-normalizes each sample at load (reference
    TimeSeriesLoader.java:71 under APPLY_Z_NORM; σ=0 → divide 1) via a
    per-sample window aggregate — stays JVM-side.
    """
    lines = (
        spark.read.text(path)
        .withColumn("sample_id", F.monotonically_increasing_id())
        .filter(~F.col("value").startswith("@") & (F.trim("value") != ""))
    )
    toks = lines.select(
        "sample_id",
        F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ").alias("toks"),
    )
    # first token = label; rest = values with NaN/unparseable dropped
    exploded = toks.select(
        "sample_id",
        F.col("toks")[0].cast("double").alias("label"),
        F.posexplode(F.slice("toks", 2, 1_000_000)).alias("raw_t", "tok"),
    ).withColumn("v", F.col("tok").cast("double"))
    kept = exploded.filter(F.col("v").isNotNull() & ~F.isnan("v"))
    from pyspark.sql import Window as W

    w = W.partitionBy("sample_id").orderBy("raw_t")
    out = kept.select(
        "sample_id",
        "label",
        (F.row_number().over(w) - 1).alias("t"),
        F.col("v").alias("value"),
    )
    if norm:
        ws = W.partitionBy("sample_id")
        mu = F.avg("value").over(ws)
        sd = F.stddev_pop("value").over(ws)
        out = out.withColumn(
            "value",
            (F.col("value") - mu) / F.when(sd > 0, sd).otherwise(F.lit(1.0)),
        )
    return out


def load_ucr_numpy(
    path: str, norm: bool = True
) -> tuple[list[np.ndarray], np.ndarray]:
    """Driver-side UCR loader for small fixtures / kernel tests.

    ``norm`` z-normalizes each series at load, like the reference
    (TimeSeriesLoader.java:71 ``ts.norm()`` under APPLY_Z_NORM=true,
    TimeSeries.java:19): subtract mean, divide σ (σ=0 → divide 1). Without
    it the normMean=false half of every classifier grid would keep a DC
    coefficient the reference never sees."""
    series, labels = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("@"):
                continue
            toks = line.split()
            labels.append(float(toks[0]))
            vals = []
            for tok in toks[1:]:
                try:
                    v = float(tok)
                except ValueError:
                    continue
                if not np.isnan(v):
                    vals.append(v)
            x = np.asarray(vals, dtype=np.float64)
            if norm and x.size:
                from sfa_spark.transform.mft import znorm

                x = znorm(x, norm_mean=True)
            series.append(x)
    return series, np.asarray(labels)


def load_multivariate_numpy(
    path: str, derivatives: bool = False
) -> tuple[list[list[np.ndarray]], np.ndarray]:
    """Driver-side multivariate loader (TimeSeriesLoader.java:84-138):
    one timestep per line ``id ts label d1 … dk``, samples split on id
    change, timestamp ignored, NO z-norm (the reference MTS path never
    calls ts.norm()). ``derivatives`` interleaves first-difference
    channels (getDerivatives, TimeSeriesLoader.java:140-156)."""
    samples: list[list[list[float]]] = []
    labels: list[float] = []
    last_id = None
    cur: list[list[float]] | None = None
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) < 4:
                continue
            sid = int(toks[0])
            if sid != last_id:
                if cur is not None and cur[0]:
                    samples.append(cur)
                last_id = sid
                cur = [[] for _ in range(len(toks) - 3)]
                labels.append(float(toks[2]))
            for dim in range(len(toks) - 3):
                try:
                    cur[dim].append(float(toks[dim + 3]))
                except ValueError:
                    continue
    if cur is not None and cur[0]:
        samples.append(cur)
    out = [[np.asarray(d, dtype=np.float64) for d in dims] for dims in samples]
    if derivatives:
        out = [
            [x for d in dims for x in (d, np.diff(d))] for dims in out
        ]
    return out, np.asarray(labels, dtype=np.float64)


def load_multivariate(spark: SparkSession, path: str) -> DataFrame:
    """Multivariate file → long DataFrame (sample_id, label, t, dim, value).

    One timestep per line: ``id ts label d1 … dk``; the ts column is
    parsed then ignored (position within the sample is the index), as in
    TimeSeriesLoader.java:112-113.
    """
    lines = spark.read.text(path).filter(F.trim("value") != "")
    toks = lines.select(
        F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ").alias("toks")
    )
    base = toks.select(
        F.col("toks")[0].cast("long").alias("sample_id"),
        F.col("toks")[1].cast("long").alias("raw_ts"),
        F.col("toks")[2].cast("double").alias("label"),
        F.posexplode(F.slice("toks", 4, 1_000_000)).alias("dim", "tok"),
    ).withColumn("value", F.col("tok").cast("double"))
    from pyspark.sql import Window as W

    w = W.partitionBy("sample_id", "dim").orderBy("raw_ts")
    return base.filter(F.col("value").isNotNull()).select(
        "sample_id",
        "label",
        (F.row_number().over(w) - 1).alias("t"),
        "dim",
        "value",
    )


def with_derivative(long_df: DataFrame) -> DataFrame:
    """Append first-difference channels: dim k → extra dim k+K with
    value[t] - value[t-1] (first point dropped), TimeSeriesLoader.java:140-156."""
    from pyspark.sql import Window as W

    k_max = long_df.agg(F.max("dim")).collect()[0][0] + 1
    w = W.partitionBy("sample_id", "dim").orderBy("t")
    deriv = (
        long_df.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "sample_id",
            "label",
            (F.col("t") - 1).alias("t"),
            (F.col("dim") + F.lit(k_max)).alias("dim"),
            (F.col("value") - F.col("prev")).alias("value"),
        )
    )
    return long_df.unionByName(deriv)


def random_walks(
    spark: SparkSession, n_series: int, length: int, seed: int = 42
) -> DataFrame:
    """Seeded random walks as a long table (series_id, t, value).

    Executor-side synthesis: each series is generated inside mapInPandas
    from a generator seeded by (seed, series_id) — deterministic under any
    partitioning, no driver loop (TimeSeriesLoader.java:231-242 analogue).
    """

    def gen(batches):
        for pdf in batches:
            outs = []
            for sid in pdf["series_id"]:
                rng = np.random.default_rng((seed, int(sid)))
                vals = np.cumsum(rng.standard_normal(length))
                outs.append(
                    pd.DataFrame(
                        {"series_id": int(sid), "t": np.arange(length), "value": vals}
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    ids = spark.range(n_series).withColumnRenamed("id", "series_id")
    # spread series across partitions before the expensive generation
    ids = ids.repartition(min(n_series, spark.sparkContext.defaultParallelism))
    return ids.mapInPandas(gen, schema="series_id long, t long, value double")


def read_sample_subsequence(path: str) -> np.ndarray:
    """One long series from a whole file of whitespace/tab-separated
    values (TimeSeriesLoader.java:173-195 readSampleSubsequence): all
    lines concatenated, NaN/empty tokens dropped."""
    vals: list[float] = []
    with open(path) as f:
        for line in f:
            for tok in line.split():
                if tok and tok != "NaN":
                    try:
                        vals.append(float(tok))
                    except ValueError:
                        continue
    return np.asarray(vals, dtype=np.float64)


def read_samples_query_series(path: str) -> list[np.ndarray]:
    """One series per line, no label column
    (TimeSeriesLoader.java:197-225 readSamplesQuerySeries) — the query
    format of the bundled indexing dataset (query_lightcurves.txt)."""
    out: list[np.ndarray] = []
    with open(path) as f:
        for line in f:
            vals = []
            for tok in line.split():
                if tok and tok != "NaN":
                    try:
                        vals.append(float(tok))
                    except ValueError:
                        continue
            if vals:
                out.append(np.asarray(vals, dtype=np.float64))
    return out
