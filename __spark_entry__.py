"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship KG-construction query on sf0.001.
queries()      -> operator inventory per SURVEY.md §2.2 (cli_p_spark.plans.contract).
oracle_sql()   -> DuckDB twins; kg_* entries are UDF-based (rows-only check),
                  their correctness gate is tests/ vs the NumPy exact oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triples over sf0.001.

    Loads the driver's flat documents table, lifts each row into the
    interleaved-span shape (one text span per doc — the degenerate case of
    the input_hint schema), links every span against a deterministic
    entity index via the exact broadcast-GEMM search, and returns the
    (subj, pred, obj, score, span_idx, rank) triples.
    """
    from cli_p_spark.config import PipelineConfig
    from cli_p_spark.fixtures.generate import make_entities
    from cli_p_spark.plans.pipeline import build_triples_exact

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = flat.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    ents = make_entities(200)
    cfg = PipelineConfig(tau=0.0, k=1)  # rank-1 link for every doc
    triples, _skips = build_triples_exact(docs, ents, cfg)
    return triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cli_p_spark.plans.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cli_p_spark.plans.contract import ORACLES

    return dict(ORACLES)
