"""Data-layout operators — Z-order clustering keys for multi-column
data skipping.

Why here: at 100 TB the fastest operator is the scan that never
happens.  Parquet/Iceberg prune files by per-file min/max stats, but
stats only help if the layout CLUSTERS each filter column — and sorting
by (a, b) clusters a while scattering b.  The Z-order (Morton) curve
interleaves the bit planes of all dimensions, so a sort by the single
z key gives every dimension locality proportional to its bit share:
range filters on ANY of the dims skip most files (the Delta/Iceberg
`OPTIMIZE ZORDER BY` primitive, as a plain Catalyst expression).

Design for cross-engine exactness (the repo's standard discipline):
dimensions are binned into fixed [lo, hi) integer grids with the same
injected repr-width literals the histogram sketch uses, and the
interleave is pure int64 shifts/masks — Spark and DuckDB compute the
IDENTICAL key for every row, so layout decisions are reproducible by
any engine that can read the table.

Scale shape: the key is a per-row expression (zero shuffle to compute);
the layout write is one range-partitioned sort by z — the same single
sort a plain ORDER BY layout costs, but clustering every filter
dimension at once.  bits_per_dim * n_dims must be <= 62."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_col(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Integer grid cell of a value in [lo, hi) — same clamp + injected
    repr-width literal policy as sketch.histogram_quantiles."""
    n = 1 << bits
    width = float(repr((hi - lo) / n))
    raw = F.floor((col.cast("double") - F.lit(float(repr(lo)))) / F.lit(width))
    return F.least(
        F.greatest(raw.cast("long"), F.lit(0)), F.lit(n - 1)
    )


def zorder_key(
    dims: list[tuple[Column | str, float, float]],
    bits_per_dim: int = 8,
) -> Column:
    """int64 Morton key interleaving ``bits_per_dim`` bit planes of each
    (column, lo, hi) dimension — bit i of dim d lands at position
    i * n_dims + d, so all dims share locality at every scale of the
    curve."""
    n_dims = len(dims)
    assert bits_per_dim * n_dims <= 62, "z key must fit in int64"
    bins = [
        _bin_col(F.col(c) if isinstance(c, str) else c, lo, hi, bits_per_dim)
        for (c, lo, hi) in dims
    ]
    z = F.lit(0).cast("long")
    for d, b in enumerate(bins):
        for i in range(bits_per_dim):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)),
                i * n_dims + d,
            )
    return z


def zorder_sql_expr(
    dims: list[tuple[str, float, float]],
    bits_per_dim: int = 8,
) -> str:
    """DuckDB twin of zorder_key — the same binning literals and the
    same shift/mask tree, rendered as SQL."""
    n_dims = len(dims)
    n = 1 << bits_per_dim
    terms = []
    for d, (col, lo, hi) in enumerate(dims):
        width = repr((hi - lo) / n)
        b = (
            f"LEAST(GREATEST(CAST(FLOOR((CAST({col} AS DOUBLE) - {lo!r})"
            f" / {width}) AS BIGINT), 0), {n - 1})"
        )
        for i in range(bits_per_dim):
            terms.append(f"((({b} >> {i}) & 1) << {i * n_dims + d})")
    return " + ".join(terms)


def layout_skipping_stats(
    df: DataFrame,
    dims: list[tuple[str, float, float]],
    bits_per_dim: int = 8,
    bucket_bits: int = 4,
) -> DataFrame:
    """The data-skipping evidence: rows bucketed by the TOP
    ``bucket_bits`` of their z key (= the files a z-sorted write would
    produce), with per-bucket min/max of every dimension — the stats a
    scan planner prunes on.  Tight per-bucket ranges on ALL dims at
    once is the property plain sorting cannot give."""
    z = zorder_key(dims, bits_per_dim)
    bucket = F.shiftright(z, bits_per_dim * len(dims) - bucket_bits)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, _lo, _hi in dims:
        aggs.append(F.min(col).alias(f"min_{col}"))
        aggs.append(F.max(col).alias(f"max_{col}"))
    return df.groupBy(bucket.alias("z_bucket")).agg(*aggs)
