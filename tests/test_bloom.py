"""Bloom filter (operators/bloom.py): no false negatives ever, plausible
false-positive rate, prune == contains, and the prune plan stays
broadcast-only on the probe side."""

from __future__ import annotations

from pyspark.sql import functions as F

from cli_p_spark.operators.bloom import (
    bloom_bits,
    bloom_contains,
    bloom_prune,
)

M, K = 2048, 3


def test_bloom_no_false_negatives_and_fp_sane(spark):
    build = spark.createDataFrame(
        [(i,) for i in range(0, 300)], "k long"
    )
    probe = spark.createDataFrame(
        [(i,) for i in range(0, 1500)], "k long"
    )
    bits = bloom_bits(build, "k", M, K)
    got = {
        r["k"]: r["maybe_member"]
        for r in bloom_contains(probe, "k", bits, M, K).collect()
    }
    # every build key passes (the hard guarantee)
    assert all(got[i] for i in range(300))
    # false positives bounded: fill ~ 1-exp(-K*300/M) ~ 0.36, fp ~ 4.6%
    fp = sum(1 for i in range(300, 1500) if got[i])
    assert fp / 1200 < 0.15


def test_bloom_prune_equals_contains_and_broadcasts(spark):
    build = spark.createDataFrame([(i,) for i in range(50)], "k long")
    probe = spark.createDataFrame(
        [(i, f"p{i}") for i in range(400)], "k long, payload string"
    )
    bits = bloom_bits(build, "k", M, K)
    kept = bloom_prune(probe, "k", bits, M, K)
    want = {
        r["k"]
        for r in bloom_contains(probe, "k", bits, M, K).collect()
        if r["maybe_member"]
    }
    rows = kept.collect()
    assert {r["k"] for r in rows} == want
    assert all(r["payload"] == f"p{r['k']}" for r in rows)  # row-preserving
    # physical shape: k broadcast semi joins, NO shuffle of the probe
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= K
    assert "ShuffledHashJoin" not in plan and "SortMergeJoin" not in plan


def test_bloom_contains_tolerates_duplicate_bits(spark):
    """A non-distinct bits frame (e.g. unioned filters before dedup)
    must not double-count matches into false negatives."""
    build = spark.createDataFrame([(i,) for i in range(50)], "k long")
    bits = bloom_bits(build, "k", M, K)
    dup_bits = bits.unionByName(bits)  # every position twice
    got = {
        r["k"]: r["maybe_member"]
        for r in bloom_contains(build, "k", dup_bits, M, K).collect()
    }
    assert all(got[i] for i in range(50))
