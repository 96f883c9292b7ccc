"""M3 gate: ANN (IVF-bucket-join) linking P/R >= 0.95 vs the exact oracle;
nprobe=nlist degenerates to exact (reference parity: query-index.py:30)."""

import numpy as np

from cli_p_spark.config import PipelineConfig
from cli_p_spark.fixtures.generate import documents_to_spark
from cli_p_spark.oracle.exact import golden_triples, precision_recall
from cli_p_spark.plans.pipeline import build_triples_ann


def test_ann_pipeline_pr_geq_095(spark, corpus_small):
    docs_pdf, ents_pdf = corpus_small
    cfg = PipelineConfig()
    docs = documents_to_spark(spark, docs_pdf)
    triples, _ = build_triples_ann(docs, ents_pdf, cfg, nlist=100, nprobe=32)
    got = triples.toPandas()
    golden = golden_triples(docs_pdf, ents_pdf, tau=cfg.tau, k=cfg.k)
    p, r = precision_recall(got, golden)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_nprobe_equals_nlist_is_exact(spark, corpus_small):
    """Exhaustive probing == exact cosine top-k, the reference's own
    exactness knob (nprobe=nlist => IVF == flat scan)."""
    docs_pdf, ents_pdf = corpus_small
    cfg = PipelineConfig()
    docs = documents_to_spark(spark, docs_pdf)
    nlist = 32
    triples, _ = build_triples_ann(
        docs, ents_pdf, cfg, nlist=nlist, nprobe=nlist
    )
    got = triples.toPandas()
    golden = golden_triples(docs_pdf, ents_pdf, tau=cfg.tau, k=cfg.k)
    p, r = precision_recall(got, golden)
    assert p == 1.0 and r == 1.0, (p, r)
    merged = got.merge(
        golden, on=["subj", "span_idx", "pred", "obj"], suffixes=("_s", "_o")
    )
    assert (merged["score_s"] - merged["score_o"]).abs().max() < 1e-9


def test_centroids_deterministic():
    from cli_p_spark.operators.ann import train_centroids

    rng = np.random.default_rng(7)
    X = rng.standard_normal((500, 16))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    a = train_centroids(X, nlist=20)
    b = train_centroids(X, nlist=20)
    assert np.array_equal(a, b)
