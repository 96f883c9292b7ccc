"""Z-order layout (operators/layout.py): Python Morton replication and
the data-skipping property vs a single-column sort."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cli_p_spark.operators.layout import (
    layout_skipping_stats,
    zorder_key,
)


def _py_z(x, y, lo, hi, bits):
    n = 1 << bits
    width = float(repr((hi - lo) / n))
    def b(v):
        return min(max(int((v - float(repr(lo))) // width), 0), n - 1)
    bx, by = b(x), b(y)
    z = 0
    for i in range(bits):
        z |= ((bx >> i) & 1) << (i * 2 + 0)
        z |= ((by >> i) & 1) << (i * 2 + 1)
    return z


def test_zorder_matches_python(spark):
    rng = random.Random(3)
    rows = [(rng.uniform(0, 100), rng.uniform(0, 100)) for _ in range(500)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = [
        r["z"]
        for r in df.select(
            zorder_key([("x", 0.0, 100.0), ("y", 0.0, 100.0)], 8).alias("z")
        ).collect()
    ]
    want = [_py_z(x, y, 0.0, 100.0, 8) for x, y in rows]
    assert got == want


def test_zorder_skips_on_both_dims(spark):
    """Per-bucket ranges must be tight on BOTH dims under z-order; a
    plain sort by x alone leaves y's per-bucket range ~ full width."""
    rng = random.Random(9)
    rows = [(rng.uniform(0, 100), rng.uniform(0, 100)) for _ in range(20000)]
    df = spark.createDataFrame(rows, "x double, y double")
    dims = [("x", 0.0, 100.0), ("y", 0.0, 100.0)]
    stats = layout_skipping_stats(df, dims, bits_per_dim=8, bucket_bits=4)
    got = stats.collect()
    assert len(got) == 16
    # average per-bucket span on each dim well under the full range
    for c in ("x", "y"):
        spans = [r[f"max_{c}"] - r[f"min_{c}"] for r in got]
        assert sum(spans) / len(spans) < 60.0, (c, spans)
    # contrast: bucketing by x-order leaves y unclustered
    xb = df.groupBy(
        F.least(F.floor(F.col("x") / 6.25), F.lit(15)).alias("b")
    ).agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
    yspans = [r["hi"] - r["lo"] for r in xb.collect()]
    assert sum(yspans) / len(yspans) > 90.0
