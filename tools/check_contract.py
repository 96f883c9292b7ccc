"""Local stand-in for the driver's CORRECTNESS check: run every
__spark_entry__.queries() entry and its oracle_sql() twin on the same
parquet tables, compare row count + column names + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [only_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v, strict=True):
    """strict=True compares floats by full repr — STRICTER than the
    driver's value hash, so any cross-engine ulp drift fails HERE first.
    Pass strict=False (env CHECK_LOOSE=1) for the 6-sig-digit fallback
    when triaging.  Recurses into list/tuple cells (array columns) so
    the float policy applies to embedding-style columns too."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if strict else f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x, strict) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    strict = os.environ.get("CHECK_LOOSE", "0") != "1"
    # lower(): must match the case-insensitive column-name check, or
    # case-differing names sort differently per engine and every cell
    # gets compared against the wrong column
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(
        tuple(canon_cell(r[i], strict) for i in order) for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from cli_p_spark.session import get_spark

    # Arrow DISABLED: the external driver's session leaves
    # spark.sql.execution.arrow.pyspark.enabled at Spark's default (off),
    # so createDataFrame/toPandas take the row-verifier path there.  Run
    # the local gate on the SAME path — env-dependent conversion bugs
    # (numpy.float32 cells, round-3's kg_triples_ann failure) must fail
    # HERE first.  pandas UDFs still use Arrow regardless of this flag.
    # Set CHECK_ARROW=1 to re-check the Arrow-on conversion path too.
    arrow = "true" if os.environ.get("CHECK_ARROW") == "1" else "false"
    spark = get_spark(
        app="contract-check", master="local[8]", shuffle_partitions=8,
        extra={"spark.sql.execution.arrow.pyspark.enabled": arrow},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL: unknown query names {sorted(unknown)}")
        sys.exit(1)
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"rows-only {name}: {len(srows)} rows, cols={scols}")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(os_[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(map(str.lower, scols)) != sorted(map(str.lower, ocols)):
            problems.append(f"cols {scols} vs {ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not problems:
            cs, co = canon(srows, scols), canon(orows, ocols)
            if cs != co:
                diff = [
                    (a, b) for a, b in zip(cs, co) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
