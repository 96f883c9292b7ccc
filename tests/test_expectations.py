"""Data-quality expectations (operators/expectations.py) vs hand counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from cli_p_spark.operators.expectations import (
    check_fk,
    check_rows,
    check_unique,
    expectations_report,
)


def test_expectations_report_counts(spark):
    child = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, -1.0), (3, 20, 7.5),
         (3, 99, None), (4, None, 3.0)],
        "id long, fk long, val double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")

    rows = check_rows(child, {
        "val_not_null": F.col("val").isNull(),
        "val_nonneg": F.col("val") < 0,
        "fk_not_null": F.col("fk").isNull(),
    })
    uniq = check_unique(child, ["id"], "id_unique")
    fk = check_fk(child, "fk", parent, "pk", "fk_into_parent")
    rep = {
        r["rule"]: (r["n_rows"], r["n_violations"])
        for r in expectations_report([rows, uniq, fk]).collect()
    }
    assert rep == {
        "val_not_null": (5, 1),
        "val_nonneg": (5, 1),
        "fk_not_null": (5, 1),
        "id_unique": (5, 1),       # id=3 twice -> 1 excess row
        "fk_into_parent": (5, 2),  # fk=99 and fk=NULL are orphans
    }


def test_expectations_single_pass(spark):
    """All row rules share ONE aggregate over ONE scan."""
    df = spark.range(1000).select(F.col("id").alias("x"))
    out = check_rows(df, {
        "a": F.col("x") < 0,
        "b": F.col("x") > 10**6,
        "c": F.col("x").isNull(),
    })
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range") == 1  # one source read, not one per rule
    got = {r["rule"]: r["n_violations"] for r in out.collect()}
    assert got == {"a": 0, "b": 0, "c": 0}


def test_expectations_empty_batch(spark):
    """An empty batch reports zero rows / zero violations — never NULL
    (SUM over zero rows is NULL without the coalesce)."""
    empty = spark.createDataFrame([], "id long, fk long, val double")
    rows = check_rows(empty, {"v": F.col("val").isNull()})
    uniq = check_unique(empty, ["id"], "u")
    rep = {
        r["rule"]: (r["n_rows"], r["n_violations"])
        for r in expectations_report([rows, uniq]).collect()
    }
    assert rep == {"v": (0, 0), "u": (0, 0)}
