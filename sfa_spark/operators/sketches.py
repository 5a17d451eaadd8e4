"""Mergeable streaming sketches: HyperLogLog distinct count + count-min.

The continuous-aggregate tiers (rollup.py) carry associative summaries
(n/sum/min/max/first/last). Real rollup engines also carry *sketches*,
because "distinct users per hour" and "how often did X appear" do not
re-aggregate from plain numbers — but their sketches DO: HLL registers
merge by element-wise max, count-min counters merge by element-wise sum.
That mergeability is exactly what lets the 1h→1d tier cascade reuse the
finer tier instead of rescanning raw data (same design as the tier
re-aggregation in rollup.reaggregate).

* **HyperLogLog** (Flajolet et al. 2007, with the standard small-range
  linear-counting correction from the HLL paper / Heule et al.'s
  discussion): ``2^p`` registers, register = max over observed hashes of
  (leading-zero rank of the hash's top bits), bucket = low ``p`` bits.
* **Count-min** (Cormode & Muthukrishnan 2005): ``d`` hash rows ×
  ``w`` counters; point estimate = min over rows.

Scale design (100 TB):

* The hash is Spark's built-in ``xxhash64`` — JVM whole-stage-codegen,
  zero Python in the data plane. The DuckDB oracle re-implements
  XXH64-of-a-long bit-for-bit in HUGEINT SQL (queries._xxh64_cte), so
  the driver check covers the exact production hash, not an
  "oracle-mode" stand-in.
* Register/counter tables are SPARSE DataFrames bounded by
  ``groups × 2^p`` (resp. ``groups × d × w``) rows — a hash aggregate
  with map-side partial combine; never a per-row state object. Missing
  registers mean 0 and are accounted for in closed form at estimate
  time.
* Estimation avoids float-summation order sensitivity: the harmonic
  denominator ``sum(2^-reg)`` is computed as an INTEGER sum scaled by
  ``2^(64-p)`` (each term exact, decimal(38) accumulation exact), so
  the estimate is a deterministic function of the registers on any
  engine — this is what makes the DuckDB oracle bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_alpha_scaled",
    "cms_sketch",
    "cms_estimate",
    "cms_merge",
]


def hll_alpha_scaled(p: int) -> float:
    """``alpha_m * m^2 * 2^(maxrank-1)`` — the numerator of the raw HLL
    estimate against the scaled integer harmonic sum. Computed once in
    Python and embedded as the SAME double literal in the Spark plan and
    the DuckDB oracle, so both sides divide identical doubles."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << (64 - p))  # maxrank-1 == 64-p


def _rank_expr(h: Column, p: int) -> Column:
    """Leading-zero rank of the top ``64-p`` bits of hash ``h`` (signed
    long): 1 + #leading zeros among those bits; all-zero → 64-p+1.

    Bit length of the unsigned-shifted value via the classic bit-smear
    (OR in right-shifts by 1,2,4,8,16,32 → all bits below the MSB set)
    followed by ``bit_count`` — pure integer codegen, no per-row string
    allocation (r6: replaced ``length(bin(w))``, which built a base-2
    STRING per row; verified equal on 10M hashes + edge values, ~30%
    faster and GC-free)."""
    w = F.shiftrightunsigned(h, p)
    maxrank = 64 - p + 1
    s = w
    for sh in (1, 2, 4, 8, 16, 32):
        s = s.bitwiseOR(F.shiftrightunsigned(s, sh))
    return F.when(w == 0, F.lit(maxrank)).otherwise(
        F.lit(maxrank) - F.bit_count(s)
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Sparse HLL register table: group_cols + (reg_idx, reg).

    One hash aggregate over the input; duplicates of a value cannot
    change any register (max of an identical rank), which is the whole
    point of sketched distinct counting."""
    h = F.xxhash64(F.col(value_col))
    # low p bits of the unsigned hash: pmod folds Java's signed % back
    bucket = F.pmod(h, F.lit(1 << p))
    # NULLs are dropped, not hashed: Spark's xxhash64 maps NULL to the
    # seed while SQL engines propagate NULL — and "distinct count" of a
    # NULL sentinel is rarely what a caller means
    df = df.filter(F.col(value_col).isNotNull())
    # NOTE (r6): deliberately NOT wired to scanfix.pin_scan_parallelism —
    # unlike the minute-tier rollup, the register partial agg genuinely
    # combines (duplicate users collapse: 7.8 MB partial state vs 23 MB
    # raw rows at sf1.0) and the A/B measured the repartition-first shape
    # 2× SLOWER (0.41s vs 0.92s). Measured, not assumed.
    return (
        df.groupBy(*group_cols, bucket.alias("reg_idx"))
        .agg(F.max(_rank_expr(h, p)).alias("reg"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge finer-grained register tables into coarser groups:
    element-wise max. ``group_cols`` are the SURVIVING group columns
    (e.g. day when merging hour-level registers)."""
    return registers.groupBy(*group_cols, "reg_idx").agg(
        F.max("reg").alias("reg")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 12,
    round_to: int = 4,
) -> DataFrame:
    """Cardinality estimate per group from a sparse register table.

    Raw estimate ``alpha_m * m^2 / sum_j 2^-reg_j`` with the harmonic
    sum done in EXACT integer arithmetic (scaled by ``2^(maxrank-1)``,
    accumulated in decimal(38,0)); linear counting ``m * ln(m/zeros)``
    below the standard ``2.5 m`` threshold. Output: group_cols +
    (est, zeros)."""
    m = 1 << p
    maxrank = 64 - p + 1
    # 2^(maxrank-1-reg), reg in [1, maxrank] → exact long
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({maxrank - 1} - reg AS INT))")
    amm = hll_alpha_scaled(p)
    g = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nreg"),
        F.sum(term.cast("decimal(38,0)")).alias("_sumv"),
    )
    total = (
        (F.lit(m).cast("decimal(38,0)") - F.col("_nreg"))
        * F.lit(1 << (maxrank - 1)).cast("decimal(38,0)")
        + F.col("_sumv")
    ).cast("double")
    zeros = (F.lit(m) - F.col("_nreg")).cast("long")
    raw = F.lit(amm) / total
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)
    return g.select(
        *group_cols,
        F.round(est, round_to).alias("est"),
        zeros.alias("zeros"),
    )


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch: group_cols + (row, bucket, cnt), ``d × w``
    counters per group, sparse (absent counter = 0).

    Row hashes are the production chain ``xxhash64(value, row_id)`` —
    XXH64 re-seeded per row by hash chaining, the same construction
    Spark uses for multi-column hashes."""
    rows = F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("row")
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    e = (
        df.filter(F.col(value_col).isNotNull())  # same NULL rule as HLL
        .select(*group_cols, F.col(value_col), wcol.alias("_w"))
        .select("*", rows)
    )
    bucket = F.pmod(F.xxhash64(F.col(value_col), F.col("row").cast("long")), F.lit(w))
    return (
        e.groupBy(*group_cols, "row", bucket.alias("bucket"))
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_merge(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches into coarser groups: element-wise counter sum."""
    return sketch.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    group_cols: list[str],
    value_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point estimates for ``queries`` (distinct values per group):
    ``min`` over the ``d`` rows of the addressed counters. Output:
    queries' columns + est (BIGINT, always >= true count).

    The join is an equi-join on (group, row, bucket) against a sketch of
    at most ``groups × d × w`` rows — broadcastable for any realistic
    sketch size."""
    rows = F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("row")
    q = queries.select("*", rows).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(value_col), F.col("row").cast("long")), F.lit(w))
    )
    joined = q.join(F.broadcast(sketch), [*group_cols, "row", "bucket"], "left")
    return (
        joined.groupBy(*queries.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
