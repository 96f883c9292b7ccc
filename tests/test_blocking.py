"""Sorted-neighborhood blocking (operators/blocking.py)."""

from __future__ import annotations

import pytest


def test_snm_pairs_small(spark):
    from cli_p_spark.operators.blocking import sorted_neighborhood_pairs

    rows = [
        (1, "apple", "k1"),
        (2, "apply", "k1"),
        (3, "banana", "k1"),
        (4, "cherry", "k1"),
        (5, "apple", "k2"),
    ]
    df = spark.createDataFrame(rows, "rid bigint, name string, kk string")
    out = sorted_neighborhood_pairs(df, "kk", "name", "rid", window=2)
    got = sorted(tuple(r) for r in out.collect())
    # within k1, order is (apple,1) (apply,2) (banana,3) (cherry,4);
    # window=2 pairs only adjacent ranks; k2 has a single row -> no pair
    assert got == [
        ("k1", 1, 2, 1),
        ("k1", 2, 3, 1),
        ("k1", 3, 4, 1),
    ]


def test_snm_wider_window_and_id_tiebreak(spark):
    from cli_p_spark.operators.blocking import sorted_neighborhood_pairs

    # duplicate sort values: id breaks the tie deterministically
    rows = [(3, "x", "k"), (1, "x", "k"), (2, "y", "k")]
    df = spark.createDataFrame(rows, "rid bigint, name string, kk string")
    out = sorted_neighborhood_pairs(df, "kk", "name", "rid", window=3)
    got = sorted(tuple(r) for r in out.collect())
    # order: (x,1) (x,3) (y,2) -> pairs at gaps 1 and 2
    assert got == sorted(
        [("k", 1, 3, 1), ("k", 1, 2, 2), ("k", 3, 2, 1)]
    )


def test_snm_matches_duckdb_twin(spark, tmp_path):
    import random

    import duckdb

    from cli_p_spark.operators.blocking import (
        sorted_neighborhood_pairs,
        sorted_neighborhood_sql,
    )

    rng = random.Random(37)
    rows = [
        (i, "n%02d" % rng.randrange(15), "k%d" % rng.randrange(6))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "rid bigint, name string, kk string")
    p = str(tmp_path / "rows.parquet")
    df.write.mode("overwrite").parquet(p)
    out = sorted_neighborhood_pairs(df, "kk", "name", "rid", window=4)
    got = sorted(tuple(r) for r in out.collect())
    sql = sorted_neighborhood_sql(
        f"read_parquet('{p}/*.parquet')", "kk", "name", "rid", window=4
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
    assert len(got) > 0


def test_snm_window_validation(spark):
    from cli_p_spark.operators.blocking import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "a", "k")],
                               "rid bigint, name string, kk string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "kk", "name", "rid", window=1)


def test_snm_null_sort_values_match_duckdb(spark, tmp_path):
    import duckdb

    from cli_p_spark.operators.blocking import (
        sorted_neighborhood_pairs,
        sorted_neighborhood_sql,
    )

    # NULL sort values: Spark ASC defaults NULLS FIRST, DuckDB NULLS
    # LAST — the operator pins NULLS LAST on both engines
    rows = [(1, None, "k"), (2, "a", "k"), (3, "b", "k"), (4, None, "k")]
    df = spark.createDataFrame(rows, "rid bigint, name string, kk string")
    p = str(tmp_path / "rows.parquet")
    df.write.mode("overwrite").parquet(p)
    out = sorted_neighborhood_pairs(df, "kk", "name", "rid", window=2)
    got = sorted(tuple(r) for r in out.collect())
    sql = sorted_neighborhood_sql(
        f"read_parquet('{p}/*.parquet')", "kk", "name", "rid", window=2
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
    # order must be a, b, NULL(1), NULL(4) -> adjacent pairs
    assert got == [("k", 1, 4, 1), ("k", 2, 3, 1), ("k", 3, 1, 1)]


def test_snm_plan_joins_on_rank_not_residual(spark):
    from cli_p_spark.operators.blocking import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "a", "k"), (2, "b", "k")], "rid bigint, name string, kk string"
    )
    out = sorted_neighborhood_pairs(df, "kk", "name", "rid", window=3)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the rank must be IN the equi-join key (O(m*window) matched pairs),
    # not a residual range predicate after a key-only join (O(m^2))
    assert "Left keys [2]" in plan and "Right keys [2]" in plan
