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

Scale: one hash (JVM codegen) + one per-shard rank. The rank's
``row_number`` sorts WITHIN each shard — n_shards independent sorts of
corpus/n_shards rows each, which is exactly the partitioned sort a
cluster can do without a global order barrier (``repartition(shard)``
first on a real cluster keeps each sort node-local). Readers then
consume ``ORDER BY pos`` per shard — sequential scans of pre-sorted
parquet when the shard table is written sorted.

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
) -> DataFrame:
    """Assign every row a (shard, pos) for seeded-epoch reading.

    Output: all input columns + (shard, pos); ``pos`` is 0-based and
    dense within each shard.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.xxhash64(F.col(id_col), F.lit(int(seed)).cast("long"))
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(int(n_shards))))
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("_h")
    )
