"""Skew handling: hot-key detection + salted two-stage aggregation.

North rule: "partitioning hash-bucket-by-url with salting for hot-domain
skew". Where it applies in this engine:

* The tier aggregation (groupBy(url, bucket)) is naturally skew-resistant:
  Catalyst's partial (map-side) aggregation combines a hot url's raw rows
  before the shuffle, and the grouping key includes the time bucket, so
  cardinality is high. AQE's skew handling covers the residue.
* Per-key GROUPED ops (applyInPandas) have no partial-agg escape — a url
  holding 30% of rows becomes one giant task. The encode stage avoids
  this structurally (epoch-aligned chunk grouping, sfa_spark.encode);
  for order-insensitive aggregations over skewed keys this module
  provides the classic explicit salt: stage 1 aggregates on
  (key, salt = hash(row) % factor), stage 2 merges the ≤factor partials.

``hot_keys`` finds heavy hitters with a cheap count aggregate so the salt
factor can be targeted rather than blanket (blanket salting doubles the
shuffle for the long tail).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key_cols: list[str], threshold_fraction: float = 0.01) -> DataFrame:
    """Keys holding more than ``threshold_fraction`` of all rows.

    One count aggregate (map-side combined). Returns (key…, n_rows).
    Collect + broadcast is the intended use: the hot set is small by
    definition (≤ 1/threshold_fraction keys).
    """
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > total * threshold_fraction)
    )


def with_salt(df: DataFrame, salt_col: str = "salt", factor: int = 16) -> DataFrame:
    """Deterministic row salt in [0, factor): hash of the whole row's
    monotonically-varying attributes is overkill — spark's per-row
    ``rand`` is non-deterministic — so derive it from a stable column set
    via xxhash64."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(factor)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    factor: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys.

    ``aggs``: name → (stage1_expr, stage2_expr) where stage1 runs on the
    salted groups and stage2 merges partials, e.g.
    ``{"n": (F.count(F.lit(1)), F.sum("n")), "mx": (F.max("v"), F.max("mx"))}``.
    Only associative summaries are expressible — by design.
    """
    salted = with_salt(df, "_salt", factor)
    stage1 = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return stage1.groupBy(*key_cols).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )
