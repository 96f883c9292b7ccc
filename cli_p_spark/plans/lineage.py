"""Checkpointed, resumable pipeline runs with per-partition lineage.

Generalizes the reference's resumability devices — the fn_db/skip_db
presence checks that make build-index.py idempotent (build-index.py:36-44,
59-61) and the per-query timing print (query-index.py:110-113) — to
partition granularity, per the north_rule: "every stage writes
per-partition lineage + metrics and commits checkpoints so a killed run
resumes at partition granularity".

Layout under ``out_dir``:

    mentions/part_id=N/...   embedding-stage output, one dir per partition
    skips/                   quarantined spans (append)
    triples/                 final links
    lineage/                 one row per (stage, part_id, run_id): counts,
                             wall seconds, timestamp, status

Resume protocol (the expensive stage is encode — that is what must not
recompute): a partition of the embedding stage is DONE iff a lineage row
(stage='embed', part_id, status='done') exists.  A resumed run anti-joins
the input against done partitions (exactly the reference's fn_db check,
build-index.py:42-44, lifted from per-file to per-partition) and appends
only the missing partition directories.  Downstream stages are cheap
relative to encode and rebuild from the union of all mention partitions.

part_id = pmod(xxhash64(doc_id), n_parts): deterministic, independent of
input order and cluster size — a resume on a different cluster still
skips the right work.
"""

from __future__ import annotations

import datetime
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from .pipeline import (
    encode_mentions,
    explode_spans,
    split_skips,
    triples_from_links,
)

LINEAGE_SCHEMA = (
    "stage string, part_id int, run_id string, status string, "
    "n_rows long, n_skips long, wall_s double, ts timestamp"
)


def _utcnow() -> datetime.datetime:
    return datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    return _read_or_none(spark, f"{out_dir}/lineage")


def _append_lineage(spark: SparkSession, out_dir: str, rows: list[tuple]):
    spark.createDataFrame(rows, LINEAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(f"{out_dir}/lineage")


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    entities_pdf,
    out_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    run_id: str = "run0",
    n_parts: int = 16,
    nlist: int = 100,
    nprobe: int = 32,
    fail_after_parts: int | None = None,
) -> dict[str, str]:
    """Execute (or resume) the KG pipeline into ``out_dir``.

    ``fail_after_parts`` simulates a mid-run kill for the resume test:
    only that many embed partitions are processed before returning.
    """
    import numpy as np

    from ..fixtures.generate import entities_to_spark
    from ..operators.ann import link_ann_join, train_centroids

    # ---- stage: embed (partition-granular, resumable) ----
    spans = explode_spans(documents).withColumn(
        "part_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int"),
    )
    lineage = read_lineage(spark, out_dir)
    if lineage is not None:
        done = {
            r["part_id"]
            for r in lineage.filter(
                (F.col("stage") == "embed") & (F.col("status") == "done")
            ).select("part_id").distinct().collect()
        }
    else:
        done = set()

    all_parts = sorted(
        r["part_id"]
        for r in spans.select("part_id").distinct().collect()
    )
    todo = [p for p in all_parts if p not in done]
    if fail_after_parts is not None:
        todo = todo[:fail_after_parts]

    if todo:
        t0 = time.time()
        batch = spans.filter(F.col("part_id").isin(todo))
        encoded = encode_mentions(batch, cfg)
        ok, skips = split_skips(encoded)
        ok.select(
            "doc_id", "span_idx", "kind", "embedding", "part_id"
        ).write.mode("append").partitionBy("part_id").parquet(
            f"{out_dir}/mentions"
        )
        skips_with_part = skips.join(
            spans.select("doc_id", "span_idx", "part_id"),
            ["doc_id", "span_idx"],
        )
        skips_with_part.write.mode("append").parquet(f"{out_dir}/skips")
        wall = time.time() - t0
        # per-partition metrics from the written data (exact counts)
        counts = {
            r["part_id"]: (r["n"],)
            for r in spark.read.parquet(f"{out_dir}/mentions")
            .filter(F.col("part_id").isin(todo))
            .groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        skip_counts = {
            r["part_id"]: r["n"]
            for r in skips_with_part.groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        now = _utcnow()
        _append_lineage(
            spark,
            out_dir,
            [
                (
                    "embed", int(p), run_id, "done",
                    int(counts.get(p, (0,))[0]),
                    int(skip_counts.get(p, 0)),
                    wall / max(len(todo), 1), now,
                )
                for p in todo
            ],
        )

    if fail_after_parts is not None:
        return {"out_dir": out_dir, "status": "killed"}

    # ---- stage: link + triples (rebuilt from all mention partitions) ----
    t0 = time.time()
    mentions = spark.read.parquet(f"{out_dir}/mentions").select(
        "doc_id", "span_idx", "kind", "embedding"
    )
    emat = np.stack(entities_pdf["embedding"].to_numpy())
    centroids = train_centroids(emat, nlist=nlist, seed=cfg.seed)
    entities = entities_to_spark(spark, entities_pdf)
    links = link_ann_join(
        mentions, entities, centroids, k=cfg.k, tau=cfg.tau, nprobe=nprobe
    )
    triples = triples_from_links(links)
    triples.write.mode("overwrite").parquet(f"{out_dir}/triples")
    n_triples = spark.read.parquet(f"{out_dir}/triples").count()
    _append_lineage(
        spark,
        out_dir,
        [("link", -1, run_id, "done", n_triples, 0, time.time() - t0,
          _utcnow())],
    )
    return {"out_dir": out_dir, "status": "done"}
