"""Registry of driver-checkable queries: (name → Spark callable, name → DuckDB oracle SQL).

Every operator claimed done in SURVEY.md §2 gets an entry here; the driver
runs the Spark side and the oracle side at sf=0.01 and compares row count +
schema + order-insensitive value hash. Column names/aliases MUST match
between the two sides. Float aggregates that are order-sensitive (sums,
averages) are rounded to 6 dp on BOTH sides so partition-order ULP noise
can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfa_spark.rollup import gap_fill_locf, reaggregate, rollup_tier

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _finish_tier(df: DataFrame) -> DataFrame:
    """Stable output shape for a rollup tier: round the order-sensitive sum."""
    return df.select(
        "user_id",
        "bucket_ts",
        "n",
        F.round("sum", 6).alias("sum_value"),
        F.col("min").alias("min_value"),
        F.col("max").alias("max_value"),
        F.col("first").alias("first_value"),
        F.col("last").alias("last_value"),
    )


_TIER_ORACLE = """
SELECT user_id,
       date_trunc('{unit}', ts) AS bucket_ts,
       count(value)             AS n,
       round(sum(value), 6)     AS sum_value,
       min(value)               AS min_value,
       max(value)               AS max_value,
       arg_min(value, ts)       AS first_value,
       arg_max(value, ts)       AS last_value
FROM events
GROUP BY 1, 2
"""


@register("rollup_1m", _TIER_ORACLE.format(unit="minute"))
def rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _finish_tier(rollup_tier(_events(spark, sf_dir), ["user_id"], "ts", "value", "1m"))


@register("rollup_1h", _TIER_ORACLE.format(unit="hour"))
def rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1m = rollup_tier(_events(spark, sf_dir), ["user_id"], "ts", "value", "1m")
    return _finish_tier(reaggregate(t1m, ["user_id"], "1h"))


@register("rollup_1d", _TIER_ORACLE.format(unit="day"))
def rollup_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1m = rollup_tier(_events(spark, sf_dir), ["user_id"], "ts", "value", "1m")
    t1h = reaggregate(t1m, ["user_id"], "1h")
    return _finish_tier(reaggregate(t1h, ["user_id"], "1d"))


@register(
    "locf_gapfill_1h",
    """
WITH agg AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         count(*) AS n, arg_max(value, ts) AS lastv
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM agg GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM span
), joined AS (
  SELECT s.user_id, s.bucket_ts, a.n, a.lastv
  FROM spine s LEFT JOIN agg a USING (user_id, bucket_ts)
)
SELECT user_id, bucket_ts,
       coalesce(n, 0) AS n,
       (n IS NULL)    AS locf_filled,
       last_value(lastv IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS last_value
FROM joined
""",
)
def locf_gapfill_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1h = rollup_tier(_events(spark, sf_dir), ["user_id"], "ts", "value", "1h")
    filled = gap_fill_locf(t1h, ["user_id"], "1h")
    return filled.select(
        "user_id", "bucket_ts", "n", "locf_filled", F.col("last").alias("last_value")
    )
