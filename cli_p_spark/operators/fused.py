"""Fused encode+search: one Arrow pass from spans to links.

The reference encodes a query and searches the index in the same process,
back to back (query-index.py:107-111) — there is no serialization boundary
between the encoder and the index.  The modular Spark pipeline
(encode UDF -> link UDF) re-crosses the Python<->JVM boundary with the
embedding column in between; at 130k mentions that Arrow round trip of
array<float> costs more than all the math combined (measured ~8s vs ~1s).

This operator runs encode_batch and the IVF search inside ONE mapInPandas
stage: span text goes in, (entity_id, score, rank | skip) comes out, and
the 512-d vectors live only as a NumPy matrix inside the Arrow batch.
ZERO shuffle, ZERO vector serialization.  This is the throughput path for
the 100 TB corpus; the modular operators remain for pipelines that must
persist embeddings (resume/lineage writes mentions anyway — that write IS
the one legitimate vector serialization).

Output rows: one per QUARANTINED span (entity_id NULL, skip_reason set,
-> skips) plus one per link with score >= tau (rank-1..k).  A span that
encodes fine but whose best candidate scores below tau yields NO row —
thresholded linking semantics; reconcile span counts against
links+skips+sub-tau upstream if an audit needs all three buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.encoder import encode_batch
from .ann import _IvfIndex, _emit_topk_cand, build_ivf_broadcast_value

FUSED_SCHEMA = (
    "doc_id string, span_idx int, kind string, "
    "entity_id string, score double, rank int, skip_reason string"
)


def encode_and_link(
    spans: DataFrame,
    entities_pdf: pd.DataFrame,
    centroids: np.ndarray,
    cfg: PipelineConfig = PipelineConfig(),
    nprobe: int = 32,
) -> DataFrame:
    """spans(doc_id, span_idx, kind, content) -> fused link rows."""
    spark = spans.sparkSession
    bc = spark.sparkContext.broadcast(
        build_ivf_broadcast_value(entities_pdf, centroids)
    )
    dim, seed, k, tau = cfg.dim, cfg.seed, cfg.k, cfg.tau

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = _IvfIndex.from_broadcast(bc.value)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            mat, ok = encode_batch(pdf["content"], dim=dim, seed=seed)
            base = pdf[["doc_id", "span_idx", "kind"]].reset_index(drop=True)
            # quarantined spans: explicit skip rows (-> skips table)
            if not ok.all():
                sk = base[~ok].copy()
                sk["entity_id"] = None
                sk["score"] = np.nan
                sk["rank"] = pd.array([None] * len(sk), dtype="Int32")
                sk["skip_reason"] = "decode_error"
                yield sk
            if ok.any():
                okb = base[ok].reset_index(drop=True)
                cand, sc64 = idx.search(mat[ok].astype(np.float64), k, nprobe)
                for out in _emit_topk_cand(
                    okb, ["doc_id", "span_idx", "kind"],
                    cand, sc64, idx.eids, k, tau,
                ):
                    out["skip_reason"] = None
                    yield out

    return spans.mapInPandas(run, schema=FUSED_SCHEMA)


def fused_triples(
    documents: DataFrame,
    entities_pdf: pd.DataFrame,
    centroids: np.ndarray,
    cfg: PipelineConfig = PipelineConfig(),
    nprobe: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """documents -> (triples, skips) through the fused path."""
    from ..plans.pipeline import explode_spans, triples_from_links

    spans = (
        explode_spans(documents)
        .withColumn(
            "content",
            F.when(F.col("kind") == "text", F.col("text")).otherwise(
                F.col("media_ref")
            ),
        )
        .repartition(cfg.embed_partitions)
        .select("doc_id", "span_idx", "kind", "content")
    )
    out = encode_and_link(spans, entities_pdf, centroids, cfg, nprobe)
    links = out.filter(F.col("entity_id").isNotNull())
    skips = out.filter(F.col("skip_reason").isNotNull()).select(
        "doc_id", "span_idx", "kind", "skip_reason"
    )
    return triples_from_links(links), skips
