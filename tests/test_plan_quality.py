"""Physical-plan quality gates — the scale properties the engine relies on
must survive refactors: column pruning reaches the parquet scan, tier
aggregation is map-side combined (partial+final), small dimension joins
broadcast, and fan-out stages keep explicit partitioning.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sfa_spark.encode import encode_tier_blocks_gapfill
from sfa_spark.rollup import gap_fill_locf, rollup_tier


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rollup_prunes_columns_and_combines_map_side(events):
    p = plan_of(rollup_tier(events, ["user_id"], "ts", "value", "1m"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "user_id", "value"}, cols  # 3 of 6 columns read
    assert p.count("HashAggregate") >= 2  # partial + final


def test_locf_join_is_broadcast(events):
    t = rollup_tier(events, ["user_id"], "ts", "value", "1h")
    p = plan_of(gap_fill_locf(t, ["user_id"], "1h"))
    assert "BroadcastHashJoin" in p  # spine ⋈ observed buckets
    assert "CartesianProduct" not in p


def test_encode_pins_explicit_partitioning(events):
    t = rollup_tier(events, ["user_id"], "ts", "value", "1m")
    p = plan_of(encode_tier_blocks_gapfill(t, "user_id", tier="1m"))
    # the fan-out repartition must be REPARTITION_BY_NUM (user-pinned,
    # AQE may not coalesce it away)
    assert "REPARTITION_BY_NUM" in p or "RoundRobinPartitioning" in p or re.search(
        r"Exchange hashpartitioning\(user_id.*REPARTITION", p
    ), p


def test_filter_pushdown_reaches_scan(events):
    p = plan_of(events.filter(F.col("user_id") == 7).select("value"))
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]" in p, p
