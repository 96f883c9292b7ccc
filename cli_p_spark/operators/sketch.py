"""Cardinality sketching as pure DataFrame ops — a deterministic
HyperLogLog (Flajolet et al. 2007) built from xxhash64 + integer
register math.

Spark's built-in `approx_count_distinct` IS HyperLogLog++ and is the
right tool in production (JVM, partial-aggregating, mergeable).  What it
cannot be is cross-engine verified: its register layout and bias tables
are implementation-private.  This sketch exists to make the sketch
FAMILY first-class and checkable: every step — bucket split, rank
(leading-zero) extraction, per-bucket max, harmonic sum — is a Catalyst
expression over xxhash64, and the final estimate is ONE f64 division of
integer-exact operands, so Spark, DuckDB (replaying the staged hashes),
and a pure-Python loop produce the IDENTICAL estimate bit-for-bit.

Integer-exactness trick: the harmonic term sum(2^-M_j) is kept as the
INTEGER sum(2^(RANK_CAP - M_j)) (RANK_CAP = 40; ranks above it are
astronomically rare — p < m·2^-40 per distinct — and capping only
rounds the harmonic term by < 2^-40 relative).  alpha_m * m^2 * 2^40 is
precomputed in Python and injected as the same f64 literal on both
engines.  No libm anywhere (the standard small-range linear-counting
correction needs ln(); it is intentionally omitted — callers wanting
small-cardinality precision should use exact count_distinct, and the
accuracy gate in tests covers the uncorrected regime).

Scale shape: one groupBy (group_cols, bucket) with map-side partial
max — shuffle rows = groups × m regardless of input size; sketches are
mergeable by construction (max of register maxes)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_CAP = 40


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    log2m: int = 10,
) -> DataFrame:
    """(group_cols..., hll_estimate) — deterministic HLL cardinality of
    ``key_col`` per group; standard error ~ 1.04/sqrt(2^log2m) (3.3% at
    log2m=10).  The estimate is a pure function of the xxhash64 values
    (no RNG, no engine-private state)."""
    gcols = list(group_cols or [])
    return hll_from_hashes(
        df.select(*gcols, F.xxhash64(F.col(key_col)).alias("_h")),
        "_h", gcols, log2m,
    )


def hll_from_hashes(
    df: DataFrame,
    hash_col: str,
    group_cols: list[str] | None = None,
    log2m: int = 10,
) -> DataFrame:
    """Register pipeline over precomputed 64-bit hashes — split out so a
    staged-parquet oracle can replay the exact same hash bytes (DuckDB
    has no xxhash64)."""
    gcols = list(group_cols or [])
    m = 1 << log2m
    est_num = repr(_alpha(m) * m * m * float(1 << RANK_CAP))

    h = F.col(hash_col)
    # low log2m bits pick the register; the NEXT 63-log2m bits feed the
    # rank.  Shift into the positive range first (Java longs are signed).
    bucket = F.pmod(h, F.lit(m))
    rest = F.shiftrightunsigned(h, log2m)
    # rank = leading position of the first 1-bit in `rest` scanning from
    # the least-significant side == number of trailing zeros + 1, capped.
    # trailing zeros via bit trick: rest & -rest isolates the lowest set
    # bit; log2 of a power of two == 63 - leading zeros, but Catalyst
    # lacks clz — use bit_count((rest & -rest) - 1) = index of that bit.
    lowest = rest.bitwiseAND(-rest)
    rank = F.when(rest == 0, F.lit(RANK_CAP)).otherwise(
        F.least(F.bit_count(lowest - 1) + 1, F.lit(RANK_CAP))
    )
    regs = (
        df.select(*gcols, bucket.alias("_b"), rank.alias("_r"))
        .groupBy(*gcols, "_b")
        .agg(F.max("_r").alias("_m"))
    )
    # integer harmonic term: registers never seen contribute 2^RANK_CAP
    # each (rank 0), i.e. (m - observed) * 2^RANK_CAP added to the sum
    seen = regs.groupBy(*gcols).agg(
        F.sum(F.expr(f"shiftleft(1L, {RANK_CAP} - _m)")).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    total = F.col("_s") + (F.lit(m) - F.col("_nb")) * F.lit(1 << RANK_CAP)
    return seen.select(
        *gcols,
        (F.lit(float(est_num)) / total.cast("double")).alias(
            "hll_estimate"
        ),
    )


def hll_sql(
    source_rel: str,
    key_hash_col: str,
    group_cols: list[str] | None = None,
    log2m: int = 10,
) -> str:
    """DuckDB twin over a relation that already carries the xxhash64
    value (stage it — DuckDB has no xxhash64): same bucket/rank/register
    pipeline, same integer harmonic sum, same injected f64 constant."""
    gcols = list(group_cols or [])
    m = 1 << log2m
    est_num = repr(_alpha(m) * m * m * float(1 << RANK_CAP))
    gsel = "".join(f"{c}, " for c in gcols)
    gby = ("GROUP BY " + ", ".join(gcols)) if gcols else ""
    return f"""
WITH hashed AS (
  SELECT {gsel}
         {key_hash_col} % {m} + CASE WHEN {key_hash_col} % {m} < 0
                                     THEN {m} ELSE 0 END AS b,
         ({key_hash_col} >> {log2m}) & {(1 << (64 - log2m)) - 1} AS rest
  FROM {source_rel}),
ranked AS (
  SELECT {gsel} b,
         CASE WHEN rest = 0 THEN {RANK_CAP}
              ELSE LEAST(bit_count((rest & -rest) - 1) + 1, {RANK_CAP})
         END AS r
  FROM hashed),
regs AS (SELECT {gsel} b, MAX(r) AS mr FROM ranked GROUP BY {gsel} b),
s AS (
  SELECT {gsel}
         CAST(SUM(1::BIGINT << ({RANK_CAP} - mr)) AS BIGINT) AS sm,
         COUNT(*) AS nb
  FROM regs {gby})
SELECT {gsel}
       {est_num} / CAST(sm + ({m} - nb) * (1::BIGINT << {RANK_CAP})
                        AS DOUBLE) AS hll_estimate
FROM s
"""
