"""Data-quality expectations — the validation gate a 100 TB ingest runs
before anything downstream trusts the batch (the Deequ/Great-Expectations
role, as plain Catalyst aggregations).

Reference parity: CLI-P refuses to index what it cannot decode and
records why (build-index.py:46-58 try/except → skip list); this module
is that discipline applied to TABLES — every rule returns a violation
COUNT (never a row dump: at 10^12 rows the report must stay O(rules),
not O(violations)), and the caller gates the batch on `n_violations`.

Shapes (all integer outputs, bit-exact on any engine):
- row predicates (`check_rows`): ANY number of rules in ONE scan — each
  rule is a conditional-sum column in a single agg, so adding a rule
  costs a column, not a pass.
- uniqueness (`check_unique`): one groupBy on the key; violations =
  rows beyond the first per duplicated key.
- referential integrity (`check_fk`): anti-join count, child side never
  collected; broadcast when the parent key set fits, shuffle otherwise
  (Spark's planner decides — the expression is declarative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA_COLS = ("rule", "n_rows", "n_violations")


def check_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_rows, n_violations) for per-row predicate rules —
    ``rules`` maps rule name -> VIOLATION condition (true = bad row).
    All rules evaluate in ONE pass over the table."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in rules.items():
        # coalesce: SUM over zero rows (empty batch) is NULL, and an
        # empty batch has zero violations, not unknown
        aggs.append(
            F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(
                f"_v_{name}"
            )
        )
    row = df.agg(*aggs)
    # unpivot the single agg row with ONE explode — a union of per-rule
    # select branches would re-run the agg (and re-scan the table) per
    # rule: Catalyst has no cross-branch CSE (the same trap the LSH
    # signature persist exists for)
    entries = F.array(*[
        F.struct(
            F.lit(name).alias("rule"),
            F.col("n_rows"),
            F.col(f"_v_{name}").alias("n_violations"),
        )
        for name in rules
    ])
    return row.select(F.explode(entries).alias("_e")).select(
        "_e.rule", "_e.n_rows", "_e.n_violations"
    )


def check_unique(df: DataFrame, key_cols: list[str], rule: str) -> DataFrame:
    """Violations = rows in excess of one per duplicated key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.lit(rule).alias("rule"),
            F.coalesce(F.sum("_c"), F.lit(0)).alias("n_rows"),
            F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias(
                "n_violations"
            ),
        )
    )


def check_fk(
    child: DataFrame,
    key_col: str,
    parent: DataFrame,
    parent_key_col: str,
    rule: str,
) -> DataFrame:
    """Violations = child rows (NULL keys included) with no parent row.
    Both counts stay distributed (two 1-row aggs crossJoined — no
    driver collect in the report path)."""
    orphans = child.select(F.col(key_col).alias("_k")).join(
        parent.select(F.col(parent_key_col).alias("_k")).distinct(),
        "_k",
        "anti",
    )
    return (
        child.agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_violations")))
        .select(F.lit(rule).alias("rule"), "n_rows", "n_violations")
    )


def expectations_report(parts: list[DataFrame]) -> DataFrame:
    """Union of rule frames — one row per rule, O(rules) output."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p.select(*_SCHEMA_COLS))
    return out.select(*_SCHEMA_COLS)
