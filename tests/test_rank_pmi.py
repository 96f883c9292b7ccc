"""RRF fusion (operators/rank.py) and PMI collocations
(operators/corpus.py): hand-computed cases + DuckDB twin equality."""

from __future__ import annotations

import duckdb

from cli_p_spark.operators.corpus import pmi_collocations, pmi_sql
from cli_p_spark.operators.rank import rrf_fuse, rrf_sql


def test_rrf_hand_case(spark):
    # query q: ranking A = [d1, d2, d3]; ranking B = [d3, d1] (d2 absent)
    a = spark.createDataFrame(
        [("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        "qid string, doc string, rank int",
    )
    b = spark.createDataFrame(
        [("q", "d3", 1), ("q", "d1", 2)],
        "qid string, doc string, rank int",
    )
    out = rrf_fuse(a, b, ["qid"], "doc", k=3)
    rows = {r["doc"]: (r["rrf_score"], r["fused_rank"]) for r in out.collect()}
    assert rows["d1"][0] == 1 / 61 + 1 / 62
    assert rows["d3"][0] == 1 / 63 + 1 / 61
    assert rows["d2"][0] == 1 / 62
    # d1: 1/61+1/62 ≈ .0325 > d3: 1/63+1/61 ≈ .0323 > d2
    assert (rows["d1"][1], rows["d3"][1], rows["d2"][1]) == (1, 2, 3)


def test_rrf_matches_duckdb_twin(spark, tmp_path):
    import random

    rng = random.Random(3)
    rows_a, rows_b = [], []
    for q in range(5):
        docs = list(range(30))
        rng.shuffle(docs)
        rows_a += [(q, d, i + 1) for i, d in enumerate(docs[:10])]
        rng.shuffle(docs)
        rows_b += [(q, d, i + 1) for i, d in enumerate(docs[:10])]
    a = spark.createDataFrame(rows_a, "qid int, doc int, rank int")
    b = spark.createDataFrame(rows_b, "qid int, doc int, rank int")
    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    a.write.mode("overwrite").parquet(pa)
    b.write.mode("overwrite").parquet(pb)
    got = sorted(
        (r["qid"], r["doc"], r["rrf_score"], r["fused_rank"])
        for r in rrf_fuse(a, b, ["qid"], "doc", k=5).collect()
    )
    sql = rrf_sql(
        f"SELECT qid, doc, rank FROM read_parquet('{pa}/*.parquet')",
        f"SELECT qid, doc, rank FROM read_parquet('{pb}/*.parquet')",
        ["qid"],
        "doc",
        k=5,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_pmi_hand_case(spark):
    # corpus: "a b" x4, "a c" x1 -> bigrams: (a,b)=4, (a,c)=1, N2=5
    # unigrams: a=5, b=4, c=1, N1=10
    docs = [("a b",)] * 4 + [("a c",)]
    df = spark.createDataFrame(docs, "text string")
    out = pmi_collocations(df, "text", min_count=1)
    rows = {(r["w1"], r["w2"]): (r["n_cooc"], r["lift"]) for r in out.collect()}
    # lift(a,b) = (4 * 10 * 10) / (5 * 4 * 5) = 4.0
    assert rows[("a", "b")] == (4, 4.0)
    # lift(a,c) = (1 * 100) / (5 * 1 * 5) = 4.0
    assert rows[("a", "c")] == (1, 4.0)


def test_pmi_matches_duckdb_twin(spark, tmp_path):
    import os

    d = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{d}/documents.parquet").select("text")
    got = sorted(
        (r["w1"], r["w2"], r["n_cooc"], r["lift"])
        for r in pmi_collocations(docs, "text", min_count=5).collect()
    )
    assert len(got) > 0
    sql = pmi_sql(f"read_parquet('{d}/documents.parquet')", "text", 5)
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
