"""Temporal operators (operators/temporal.py): bucketed interval
overlap join vs brute force and the plain-join DuckDB oracle,
gaps-and-islands coalescing, bitemporal snapshot."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from cli_p_spark.operators.temporal import (
    bitemporal_snapshot,
    bitemporal_snapshot_sql,
    interval_join,
    interval_join_sql,
    temporal_coalesce,
    temporal_coalesce_sql,
)


def _rand_intervals(rng, n, n_keys, span_max, horizon):
    rows = []
    for i in range(n):
        s = rng.randrange(horizon)
        rows.append((rng.randrange(n_keys), i, s, s + 1 + rng.randrange(span_max)))
    return rows


@pytest.mark.parametrize("width", [1, 7, 64])
def test_interval_join_matches_bruteforce(spark, width):
    rng = random.Random(41 + width)
    lrows = _rand_intervals(rng, 80, 5, 40, 300)
    rrows = _rand_intervals(rng, 70, 5, 40, 300)
    left = spark.createDataFrame(
        lrows, "k bigint, lid bigint, ls bigint, le bigint"
    )
    right = spark.createDataFrame(
        rrows, "k bigint, rid bigint, rs bigint, re bigint"
    )
    out = interval_join(left, right, ["k"], "ls", "le", "rs", "re", width)
    got = sorted(
        (r["k"], r["lid"], r["rid"]) for r in out.collect()
    )
    want = sorted(
        (lk, lid, rid)
        for lk, lid, ls, le in lrows
        for rk, rid, rs, re in rrows
        if lk == rk and ls < re and rs < le
    )
    assert got == want  # exact set AND no emit-once duplicates


def test_interval_join_matches_duckdb(spark, tmp_path):
    rng = random.Random(97)
    lrows = _rand_intervals(rng, 60, 4, 30, 200)
    rrows = _rand_intervals(rng, 60, 4, 30, 200)
    left = spark.createDataFrame(
        lrows, "k bigint, lid bigint, ls bigint, le bigint"
    )
    right = spark.createDataFrame(
        rrows, "k bigint, rid bigint, rs bigint, re bigint"
    )
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    left.write.mode("overwrite").parquet(lp)
    right.write.mode("overwrite").parquet(rp)
    out = interval_join(left, right, ["k"], "ls", "le", "rs", "re", 16)
    got = sorted((r["k"], r["lid"], r["rid"]) for r in out.collect())
    sql = interval_join_sql(
        f"read_parquet('{lp}/*.parquet')",
        f"read_parquet('{rp}/*.parquet')",
        ["k"], "ls", "le", "rs", "re",
        select_sql="l.k, l.lid, r.rid",
    )
    duck = sorted(duckdb.sql(sql).fetchall())
    assert got == duck


def _py_islands(rows):
    """rows: (k, s, e) -> set of (k, island_start, island_end, n)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, s, e in rows:
        by_key[k].append((s, e))
    out = []
    for k, ivs in by_key.items():
        cur = None
        for s, e in sorted(ivs):
            if cur is None or s > cur[1]:
                if cur is not None:
                    out.append((k, *cur))
                cur = [s, e, 1]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
        out.append((k, *cur))
    return sorted((k, s, e, n) for k, s, e, n in out)


def test_temporal_coalesce_matches_python_and_duckdb(spark, tmp_path):
    rng = random.Random(53)
    rows = [
        (rng.randrange(6), s, s + 1 + rng.randrange(25))
        for s in (rng.randrange(150) for _ in range(120))
    ]
    df = spark.createDataFrame(rows, "k bigint, s bigint, e bigint")
    p = str(tmp_path / "iv.parquet")
    df.write.mode("overwrite").parquet(p)
    out = temporal_coalesce(df, ["k"], "s", "e")
    got = sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_rows"])
        for r in out.collect()
    )
    assert got == _py_islands(rows)
    duck = sorted(
        duckdb.sql(
            temporal_coalesce_sql(
                f"read_parquet('{p}/*.parquet')", ["k"], "s", "e"
            )
        ).fetchall()
    )
    assert duck == got


def test_temporal_coalesce_touching_intervals_merge(spark):
    # half-open [0,5) and [5,9): 5 > 4? start==prev_end -> NOT > -> merge?
    # [0,5) and [5,9) share no point but touch; policy: touching merges
    # only when start <= prev_max_end i.e. start > prev_max starts new.
    # 5 > 5 is False -> they merge (touching counts as one island).
    df = spark.createDataFrame(
        [(1, 0, 5), (1, 5, 9), (1, 11, 12)], "k bigint, s bigint, e bigint"
    )
    out = temporal_coalesce(df, ["k"], "s", "e")
    got = sorted(
        (r["island_start"], r["island_end"], r["n_rows"])
        for r in out.collect()
    )
    assert got == [(0, 9, 2), (11, 12, 1)]


def test_bitemporal_snapshot(spark, tmp_path):
    # key 1: v1 sys [0,10) val [0,60); v2 sys [10,None) val [0,60)
    # key 2: one version, valid window misses V
    rows = [
        (1, 1, 0, 10, 0, 60, 100),
        (1, 2, 10, None, 0, 60, 150),
        (2, 1, 0, None, 30, 40, 999),
    ]
    schema = (
        "key bigint, ver bigint, sf bigint, st bigint, "
        "vf bigint, vt bigint, price bigint"
    )
    df = spark.createDataFrame(rows, schema)
    p = str(tmp_path / "vers.parquet")
    df.write.mode("overwrite").parquet(p)

    def snap(s, v):
        out = bitemporal_snapshot(df, "sf", "st", "vf", "vt", s, v)
        return sorted((r["key"], r["ver"]) for r in out.collect())

    assert snap(5, 20) == [(1, 1)]      # before v2 recorded
    assert snap(10, 20) == [(1, 2)]     # v2 current from sys=10
    assert snap(10, 35) == [(1, 2), (2, 1)]
    assert snap(10, 70) == []           # outside every validity
    duck = sorted(
        duckdb.sql(
            "SELECT key, ver FROM ("
            + bitemporal_snapshot_sql(
                f"read_parquet('{p}/*.parquet')",
                "sf", "st", "vf", "vt", 10, 35,
            )
            + ")"
        ).fetchall()
    )
    assert duck == snap(10, 35)


def test_interval_join_rejects_bad_width(spark):
    df = spark.createDataFrame([(1, 1, 0, 1)], "k long, i long, s long, e long")
    with pytest.raises(ValueError):
        interval_join(df, df, ["k"], "s", "e", "s", "e", 0)


def test_interval_join_drops_empty_intervals(spark):
    # [5,5) is empty: overlaps nothing, even intervals containing 5
    left = spark.createDataFrame(
        [(1, 10, 5, 5)], "k bigint, lid bigint, ls bigint, le bigint"
    )
    right = spark.createDataFrame(
        [(1, 20, 3, 8)], "k bigint, rid bigint, rs bigint, re bigint"
    )
    out = interval_join(left, right, ["k"], "ls", "le", "rs", "re", 4)
    assert out.count() == 0
    out2 = interval_join(right, left, ["k"], "rs", "re", "ls", "le", 4)
    assert out2.count() == 0
