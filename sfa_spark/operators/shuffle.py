"""Deterministic training-data shuffle + epoch sharding.

A training pipeline's last mile: a REPRODUCIBLE global permutation of
the corpus (so a run can resume mid-epoch and two runs see the same
order) split into worker shards. The standard trick — order by a seeded
hash of the id — makes the permutation a pure function of (corpus,
seed), independent of partitioning, insert order, or cluster size:

* ``shard``    = ``xxhash64(id, seed) pmod n_shards`` — which worker.
* ``pos``      = rank of the hash within the shard — the read order.
* new epoch    = new seed → an independent permutation, no reshuffle of
  stored data, just a different sort key.

Scale: one hash (JVM codegen) + a TWO-LEVEL rank (r6). A plain
``row_number`` over ``partitionBy(shard)`` makes one task sort a whole
shard — corpus/n_shards rows in a single task, ~10⁹ rows at the
docstring's own 10¹² scenario. Instead each shard is split into 2^k
ORDER-ALIGNED hash ranges (``shiftright(hash, 64-k)`` — every row of
sub-range s sorts strictly before every row of s+1, ties impossible
across ranges because equal hashes share a range), rows are ranked
within (shard, sub-range), and the dense shard-wide ``pos`` is the
sub-range rank plus a prefix-sum offset from the tiny
(n_shards × 2^k)-row count table, broadcast back. Identical pos values
to the single-window formulation (rank composes over an order-aligned
partition), but the biggest sort is now corpus/(n_shards·2^k) rows.
Readers consume ``ORDER BY pos`` per shard — sequential scans of
pre-sorted parquet when the shard table is written sorted.

Collisions: xxhash64 over distinct longs collides with probability
~n^2/2^65; a tie would make ``pos`` assignment partition-dependent, so
the id is the deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["shuffle_shards"]


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    seed: int,
    n_shards: int,
    sub_splits_log2: int = 6,
) -> DataFrame:
    """Assign every row a (shard, pos) for seeded-epoch reading.

    Output: all input columns + (shard, pos); ``pos`` is 0-based and
    dense within each shard. ``2^sub_splits_log2`` order-aligned hash
    sub-ranges per shard bound the largest single sort (module
    docstring) — any value in [1, 32] yields identical pos.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    k = int(sub_splits_log2)
    if not 1 <= k <= 32:
        # k=0 would degenerate (shiftright masks the shift amount to 0 in
        # the JVM, making _sub the full hash and the offsets table one
        # row per distinct id — a driver-OOM broadcast at scale)
        raise ValueError(f"sub_splits_log2 must be in [1, 32], got {k}")
    h = F.xxhash64(F.col(id_col), F.lit(int(seed)).cast("long"))
    spark = df.sparkSession
    base = (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(int(n_shards))))
        # arithmetic shift keeps SIGNED hash order: sub-range s holds
        # exactly the hashes ranking before sub-range s+1's
        .withColumn("_sub", F.shiftright(F.col("_h"), 64 - k))
        # ONE shuffle feeds BOTH consumers (the rank window and the
        # count aggregate): each requires clustering by (shard, _sub),
        # so this explicit exchange satisfies both and AQE's stage cache
        # reuses the materialized shuffle (verified at runtime: exactly
        # one scan stage executes) — without it the full corpus would be
        # scanned and hashed twice
        .repartition(
            spark.sparkContext.defaultParallelism * 2, "shard", "_sub"
        )
    )
    wloc = Window.partitionBy("shard", "_sub").orderBy(F.col("_h"), F.col(id_col))
    woff = (
        Window.partitionBy("shard")
        .orderBy("_sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("shard", "_sub")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_off", F.coalesce(F.sum("_c").over(woff), F.lit(0)))
        .drop("_c")
    )
    return (
        base.withColumn("_lpos", F.row_number().over(wloc))
        .join(F.broadcast(offsets), ["shard", "_sub"])
        .withColumn("pos", F.col("_off") + F.col("_lpos") - 1)
        .select(*df.columns, "shard", "pos")
    )
