"""As-of (latest-observation) join — the timeseries join Spark lacks.

For every left row ``(key, ts)`` attach the single right row with the
largest ``right_ts <= ts`` (direction="backward", the default) or the
smallest ``right_ts >= ts`` (direction="forward") for the same key,
optionally bounded by a staleness tolerance. This is the classic
point-in-time join of tiered timeseries stores (quote-at-trade,
last-config-before-event, next-error-after-purchase); the reference's
nearest-neighbour machinery is distance-based, so this operator is the
time-axis analogue its rollup tiers need
(cf. /root/reference/src/main/java/sfa/timeseries/TimeSeries.java
tumbling/sliding access patterns — per-key ordered scans).

Spark-first plan — union-tag + running ``last(ignorenulls)`` window, the
same shape as LOCF gap-fill (rollup.gap_fill_locf):

* NO range join, NO per-left-row probe: both sides are tagged and
  unioned, then ONE shuffle by key and ONE per-key sort by
  ``(ts, tag)`` computes every match in a single window pass.  A naive
  ``l.key = r.key AND r.ts <= l.ts`` join explodes to O(|L|·|R|) per
  key before its QUALIFY filter; this stays O(|L| + |R|) rows end to
  end — at 10^12-row scale that asymptotic gap is the whole game.
* Ties: a right row at exactly ``ts`` matches (inclusive), encoded by
  sorting the right row (tag 0) BEFORE the left row (tag 1) at equal
  timestamps in backward mode — no epsilon arithmetic.
* Skew: one hot key's history lands in one task (inherent to any
  ordered per-key pass, same as the LOCF window).  For single-key-
  dominated inputs chunk the window by epoch block first (the
  encode-stage pattern, encode.encode_tier_blocks), carrying the last
  pre-chunk right row per chunk as a seed.
* Duplicate right rows on one ``(key, right_ts)`` would make the match
  partition-order-dependent; pass ``tiebreak_col`` to reduce the right
  side to the max-tiebreak row per instant first (one extra partial
  agg, deterministic thereafter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "epoch_us"]


def epoch_us(col) -> "F.Column":
    """Microseconds-since-epoch for TIMESTAMP or TIMESTAMP_NTZ columns.

    ``unix_micros`` rejects NTZ; with the session timezone pinned UTC
    (session.py) the cast is a wall-clock identity, and timestamp
    DIFFERENCES are timezone-invariant regardless."""
    return F.unix_micros(F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    prefix: str = "asof_",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + its matched right payload.

    Output = all left columns, then ``<prefix>ts`` (matched right
    timestamp) and ``<prefix><c>`` for each ``c`` in ``right_cols``
    (default: every non-key, non-ts right column).  Unmatched (no
    candidate, or candidate outside tolerance) → nulls, like a left
    outer join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts)]

    if tiebreak_col is not None:
        # deterministic winner per (key, instant): max tiebreak
        right = (
            right.groupBy(*on, right_ts)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in right_cols]), F.col(tiebreak_col)
                ).alias("_p")
            )
            .select(*on, right_ts, *[F.col(f"_p.{c}").alias(c) for c in right_cols])
        )

    pay = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
    ).alias("_rpay")
    r2 = right.select(
        *on, F.col(right_ts).alias("_ts"), F.lit(0).alias("_tag"), pay
    )
    pay_type = r2.schema["_rpay"].dataType
    left_only = [c for c in left.columns if c not in (*on, left_ts)]
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(pay_type).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left_only],
    )
    left_schema = {f.name: f.dataType for f in left.schema.fields}
    r2 = r2.select(
        "*",
        *[
            F.lit(None).cast(left_schema[c]).alias(f"_l_{c}")
            for c in left_only
        ],
    )
    unioned = l2.unionByName(r2)

    # backward: right rows sort before an equal-ts left row so the running
    # last() sees them (inclusive match). forward: reverse time, same trick.
    ts_ord = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_ord, F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )

    if tolerance_seconds is not None:
        lag_us = (
            epoch_us(F.col("_ts")) - epoch_us(F.col("_m._rts"))
            if direction == "backward"
            else epoch_us(F.col("_m._rts")) - epoch_us(F.col("_ts"))
        )
        ok = lag_us <= F.lit(int(tolerance_seconds * 1_000_000))
        matched = matched.withColumn(
            "_m", F.when(ok, F.col("_m")).otherwise(F.lit(None).cast(pay_type))
        )

    return matched.select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(f"_l_{c}").alias(c) for c in left_only],
        F.col("_m._rts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
