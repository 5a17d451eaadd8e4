"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`sfa_spark.queries`, which holds the registry of
implemented operators (Spark callable + DuckDB oracle SQL per entry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sfa_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full tier cascade (raw → 1m → 1h) with LOCF gap-fill
    on the sf0.001 events table."""
    return _registry.locf_gapfill_1h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
