"""Round-7 optimization harness (guide §1: measure first).

NOT part of the frozen driver contract (bench.py is): this file exists so
the optimization round can time each declared query in isolation with the
noop sink (guide §1.4 — computation, not sink), repeat for a stable
minimum, and dump `.explain("formatted")` plans into plans/r07/ for the
before/after evidence the judge checks.

Usage:
  python bench_extra.py queries [name ...]   # time queries via noop sink
  python bench_extra.py plans  [suffix]      # dump explain() to plans/r07/*_<suffix>.txt
  python bench_extra.py canon                # canon_pipeline stage timings
  python bench_extra.py kg                   # kg_pipeline timing
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "plans", "r07"
)

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped_revenue",
    "q5_region_revenue",
    "window_topk_orders_per_cust",
    "knn_bruteforce_cosine",
    "doc_exact_dedup",
    "minhash_dedup_pairs",
    "simhash_dedup_pairs",
    "events_lag_gap",
    "doc_repetition_stats",
]


def _session():
    import __spark_entry__ as entry_mod
    from cli_p_spark.session import get_spark

    spark = get_spark(
        app="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    entry_mod._ensure_workers(spark)
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_queries(names: list[str]) -> None:
    from cli_p_spark.plans.contract import QUERIES

    spark = _session()
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _noop(fn(spark, SF_DIR))  # warm: scan cache, codegen, workers
        walls = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"rep{i}:{name}")
            t0 = time.time()
            _noop(fn(spark, SF_DIR))
            walls.append(round(time.time() - t0, 3))
        out[name] = {"min": min(walls), "walls": walls}
        print(f"{name:36s} min={min(walls):7.3f}  {walls}", file=sys.stderr)
    print(json.dumps(out))


def dump_plans(suffix: str, names: list[str]) -> None:
    from cli_p_spark.plans.contract import QUERIES

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = _session()
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)


def time_canon(n_mentions: int = 1_000_000) -> None:
    import bench

    spark = _session()
    wall, ev = bench._canon_job(spark, n_mentions)
    print(json.dumps({"canon_wall_s": wall, **ev}))


def time_kg(n_docs: int = 100_000) -> None:
    import bench
    from cli_p_spark.fixtures.generate import make_entities

    spark = _session()
    ents_pdf = make_entities(bench.N_ENTITIES)
    bench._kg_job(spark, ents_pdf, 2000, CPUS)  # warm
    walls = []
    n = 0
    for _ in range(REPS):
        w, n = bench._kg_job(spark, ents_pdf, n_docs, CPUS)
        walls.append(round(w, 3))
    print(json.dumps({"kg_min_s": min(walls), "walls": walls, "n": n}))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if cmd == "queries":
        time_queries(rest or HEADLINE)
    elif cmd == "plans":
        suffix = rest[0] if rest else "before"
        dump_plans(suffix, rest[1:] or HEADLINE)
    elif cmd == "canon":
        time_canon(int(rest[0]) if rest else 1_000_000)
    elif cmd == "kg":
        time_kg(int(rest[0]) if rest else 100_000)
    else:
        raise SystemExit(f"unknown command {cmd}")
