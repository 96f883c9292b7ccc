"""PQ preselect + exact rescore: P/R gate and pure-math sanity."""

import numpy as np

from cli_p_spark.config import PipelineConfig
from cli_p_spark.fixtures.generate import (
    corpus,
    documents_to_spark,
    entities_to_spark,
)
from cli_p_spark.operators.pq import link_pq, pq_encode, pq_scores, train_pq
from cli_p_spark.oracle.exact import golden_triples, precision_recall
from cli_p_spark.plans.pipeline import (
    encode_mentions,
    explode_spans,
    split_skips,
    triples_from_links,
)


def test_pq_scores_approximate_dots():
    rng = np.random.default_rng(3)
    X = rng.standard_normal((500, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    books = train_pq(X, m_subspaces=8)
    codes = pq_encode(X, books)
    Q = X[:20]
    approx = pq_scores(Q, books, codes)
    exact = Q @ X.T
    # PQ reconstruction keeps dots close and rank-1 usually right
    err = np.abs(approx - exact).mean()
    assert err < 0.15, err
    agree = (approx.argmax(1) == exact.argmax(1)).mean()
    assert agree >= 0.8, agree


def test_pq_deterministic():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((300, 32))
    a = train_pq(X, m_subspaces=4)
    b = train_pq(X, m_subspaces=4)
    assert np.array_equal(a, b)
    assert np.array_equal(pq_encode(X, a), pq_encode(X, b))


def test_pq_linking_pr_gate(spark):
    """PQ preselect (kc=32) + exact rescore holds P/R >= 0.95 — the
    big-index strategy where full vectors never broadcast."""
    cfg = PipelineConfig()
    docs_pdf, ents_pdf = corpus(n_docs=150, n_entities=1000)
    docs = documents_to_spark(spark, docs_pdf)
    emat = np.stack(ents_pdf["embedding"].to_numpy())
    books = train_pq(emat, m_subspaces=8)
    ok, _ = split_skips(encode_mentions(explode_spans(docs), cfg))
    mentions = ok.select("doc_id", "span_idx", "kind", "embedding")
    entities = entities_to_spark(spark, ents_pdf)
    links = link_pq(
        mentions, entities, ents_pdf, books, k=cfg.k, tau=cfg.tau, kc=32
    )
    got = triples_from_links(links).toPandas()
    golden = golden_triples(docs_pdf, ents_pdf, tau=cfg.tau, k=cfg.k)
    p, r = precision_recall(got, golden)
    assert p >= 0.95 and r >= 0.95, (p, r)
