"""Interval (point-in-range) join — bucketed equi-join, never a range scan.

Joins point rows ``(key, ts)`` to interval rows ``(key, start, end)``
with ``start <= ts <= end`` (or half-open ``end`` exclusive). The naive
Spark plan for a ``l.key = r.key AND l.ts BETWEEN r.start AND r.end``
join is a BroadcastNestedLoop / per-key cartesian — O(|L|·|R|) per key,
which is exactly what dies first at 10^12 rows. The timeseries-store
answer (same chunking idea as the epoch-aligned Gorilla blocks,
encode.py) is to discretize time:

* pick a bucket width ``B``;
* each interval is exploded to its covered buckets
  (``sequence(floor(start/B), floor(end/B))`` — executor-side rows, no
  driver loop, at most ``span/B + 1`` per interval);
* each point computes its single bucket;
* one hash equi-join on ``(key, bucket)`` + the exact range predicate.

Each (point, interval) pair meets in EXACTLY one bucket (the point's),
so no post-join dedup is needed. Cost: shuffle of |L| + |R|·(span/B+1)
rows and a hash join — pick ``B`` near the typical interval span so the
explode factor stays ~2. Skewed hot keys split across buckets by
construction (a hot key's points spread over its time range), and AQE
skew-join handles a hot (key, bucket).

The reference engine has no interval machinery (its joins are
similarity-based); this is the time-axis containment join its tiered
rollups need (maintenance windows, experiment windows, session
attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    inclusive_end: bool = True,
    how: str = "inner",
) -> DataFrame:
    """All (point, containing interval) pairs.

    Output: every point column + every non-key interval column.
    Overlapping intervals yield one output row per match (standard
    interval-join semantics). ``how='left'`` keeps uncontained points
    with null interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(
            f"non-key columns {sorted(clash)} exist on both sides — rename "
            "one side (the output keeps every point column plus every "
            "non-key interval column)"
        )
    b = int(bucket_seconds) * 1_000_000

    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    ivl_cols = [c for c in intervals.columns if c not in on]
    r = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(us(start_col) / F.lit(b)), F.floor(us(end_col) / F.lit(b))
            )
        ),
    )
    l = points.withColumn("_bucket", F.floor(us(point_ts) / F.lit(b)))
    upper = (
        us(point_ts) <= us(end_col) if inclusive_end else us(point_ts) < us(end_col)
    )
    cond = (us(point_ts) >= us(start_col)) & upper
    if how == "inner":
        joined = l.join(r, [*on, "_bucket"], "inner").filter(cond)
        return joined.select(*points.columns, *ivl_cols)
    # how='left' (r6): ONE left hash join with the range predicate as a
    # join condition — a point still meets each containing interval in
    # exactly one bucket (its own), and a point whose bucket holds no
    # satisfying interval is emitted once with null interval columns.
    # Replaces the distinct + left_anti formulation, which re-scanned the
    # points side twice AND dropped+duplicated point rows containing
    # NULLs (the anti join's equality never matches a NULL to itself).
    la, ra = l.alias("_l"), r.alias("_r")
    join_cond = cond
    for c in [*on, "_bucket"]:
        join_cond = (F.col(f"_l.{c}") == F.col(f"_r.{c}")) & join_cond
    joined = la.join(ra, join_cond, "left")
    return joined.select(
        *[F.col(f"_l.{c}") for c in points.columns],
        *[F.col(f"_r.{c}") for c in ivl_cols],
    )
