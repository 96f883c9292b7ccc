"""Fuzzy name matching (operators/fuzzy.py): deletion-neighborhood
completeness vs exact all-pairs Levenshtein, and the star guard."""

from __future__ import annotations

import random


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _mutate(rnd, s):
    ops = rnd.randrange(3)
    i = rnd.randrange(len(s))
    if ops == 0:
        return s[:i] + chr(97 + rnd.randrange(26)) + s[i + 1:]   # sub
    if ops == 1:
        return s[:i] + s[i + 1:]                                  # del
    return s[:i] + chr(97 + rnd.randrange(26)) + s[i:]            # ins


def test_deletion_variants_counts(spark):
    from pyspark.sql import functions as F

    from cli_p_spark.operators.fuzzy import deletion_variants

    df = spark.createDataFrame([("abcd",), ("a",), ("",)], "s string")
    got = {
        r["s"]: sorted(r["v"])
        for r in df.select(
            "s", deletion_variants(F.col("s"), 2).alias("v")
        ).collect()
    }
    # abcd: itself + 4 one-deletes + 6 two-deletes, all distinct
    assert len(got["abcd"]) == 11 and "bd" in got["abcd"]
    assert got["a"] == ["", "a"]
    assert got[""] == [""]


def test_fuzzy_pairs_complete_vs_exact(spark):
    """Every pair within d<=2 of an exact all-pairs scan is found (the
    SymSpell completeness guarantee), nothing extra, exact distances."""
    from cli_p_spark.operators.fuzzy import fuzzy_name_pairs

    rnd = random.Random(17)
    base = [
        "".join(chr(97 + rnd.randrange(26)) for _ in range(rnd.randint(6, 12)))
        for _ in range(40)
    ]
    names = set(base)
    for s in base[:20]:                      # typo neighbors
        names.add(_mutate(rnd, s))
        names.add(_mutate(rnd, _mutate(rnd, s)))
    names = sorted(names)
    want = {
        (a, b): _lev(a, b)
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if _lev(a, b) <= 2
    }
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r["src"], r["dst"]): r["dist"]
        for r in fuzzy_name_pairs(df, "name", max_dist=2).collect()
    }
    assert got == want
    assert len(want) >= 20  # the corpus actually exercises matching


def test_fuzzy_star_guard(spark):
    """Degenerate variant buckets (many short names sharing '') must
    star to the bucket-min name, not pair quadratically."""
    from cli_p_spark.operators.fuzzy import fuzzy_name_pairs

    names = [chr(97 + i) * 2 for i in range(20)]  # aa bb cc ... all d<=2
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r["src"], r["dst"])
        for r in fuzzy_name_pairs(
            df, "name", max_dist=2, max_bucket=5
        ).collect()
    }
    # star edges only: everything links to 'aa'
    assert got == {("aa", n) for n in names[1:]}
