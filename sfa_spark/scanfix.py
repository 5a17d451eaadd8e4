"""Unsplittable-scan parallelism fixup (optimization guide §2.5).

Parquet cannot be split below a row group, so a table written as one big
row group (or any gzip-like unsplittable file) scans as a single task —
and Catalyst pushes the *partial aggregation* of any ``groupBy`` over it
into that lone scan task, serializing the expensive part of the query on
one core while 31 sit idle. Measured at sf1.0 (1M rows, ONE row group):
the minute-tier rollup has 999,208 groups for 1,000,000 rows, so the
partial aggregate achieves no combining at all — it builds a 1M-entry
hash table single-threaded and then ships 37 MB of partial state, which
is MORE than the 23 MB of raw rows.

``pin_scan_parallelism(df, cols)`` repartitions such a frame by ``cols``
right after the read, moving the aggregation work behind a cheap
hash-partition write of the raw rows so it runs on every core. It is a
deliberate no-op in every situation where the fixup would be wrong:

* the frame is anything but project/filter over a single file relation
  (windows, joins, generates, caches bring their own exchanges and their
  own partitioning — adding one here would double-shuffle);
* the scan already yields at least ``defaultParallelism / 2`` partitions
  (any real multi-file / multi-row-group table, i.e. the 100 TB case —
  there the map-side partial aggregation is load-bearing and stays).

The partition count is ``2 × defaultParallelism`` (the engine-wide
straggler-smoothing fan-out, see encode_tier_blocks_gapfill) and the
partition columns should be the aggregation's key prefix so the exchange
satisfies the downstream ``ClusteredDistribution`` and every later
same-key stage (tier cascade, LOCF window, bounds aggregate) reuses it
(guide §2.4: operations keyed the same way share one exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

#: logical-plan node names that make up a bare file-scan frame
_SCAN_NODES = {"Relation", "Project", "Filter"}


def _is_bare_scan(df: DataFrame) -> bool:
    """True iff the optimized logical plan is project/filter over file
    relations only — the one shape where ``df.rdd`` is guaranteed not to
    trigger any AQE stage execution and a repartition cannot collide
    with an operator's own exchange."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    nodes = set()
    for ln in plan.splitlines():
        ln = ln.strip().lstrip(":+- ")
        if ln:
            nodes.add(ln.split(" ", 1)[0].split("[", 1)[0])
    return bool(nodes) and nodes <= _SCAN_NODES


def pin_scan_parallelism(
    df: DataFrame, part_cols: list[str | Column]
) -> DataFrame:
    """Repartition a starved bare-scan frame by ``part_cols``; no-op for
    every other input (see module docstring)."""
    try:
        if not _is_bare_scan(df):
            return df
        sc = df.sparkSession.sparkContext
        p = sc.defaultParallelism
        if df.rdd.getNumPartitions() * 2 > p:
            return df
    except Exception:  # plan introspection is best-effort
        return df
    return df.repartition(p * 2, *part_cols)
