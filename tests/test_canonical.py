"""M4 gate: canonicalization — duplicate-content mentions collapse to one
canonical id; canonical triples keep P/R vs oracle on (pred, obj)."""

from pyspark.sql import functions as F

from cli_p_spark.config import PipelineConfig
from cli_p_spark.fixtures.generate import documents_to_spark
from cli_p_spark.plans.pipeline import build_kg


def test_duplicate_mentions_share_canonical_id(spark, corpus_small):
    docs_pdf, ents_pdf = corpus_small
    docs = documents_to_spark(spark, docs_pdf)
    out = build_kg(docs, ents_pdf, PipelineConfig())
    canon = {
        r["mention_id"]: r["canonical_id"] for r in out["canonical"].collect()
    }
    # docEDGE_DUP repeats doc00000000's spans verbatim -> identical
    # embeddings (cos=1.0 >= tau_cc) -> same canonical id per span position
    dup_spans = [m for m in canon if m.startswith("docEDGE_DUP#")]
    assert dup_spans, "duplicate doc produced no mentions"
    for m in dup_spans:
        idx = m.split("#")[1]
        twin = f"doc00000000#{idx}"
        if twin in canon:
            assert canon[m] == canon[twin], (m, canon[m], canon[twin])


def test_canonical_covers_every_mention(spark, corpus_small):
    docs_pdf, ents_pdf = corpus_small
    docs = documents_to_spark(spark, docs_pdf)
    out = build_kg(docs, ents_pdf, PipelineConfig())
    n_mentions = out["mentions"].count()
    assert out["canonical"].count() == n_mentions
    assert (
        out["canonical"].filter(F.col("canonical_id").isNull()).count() == 0
    )


def test_canonical_triples_preserve_links(spark, corpus_small):
    """Canonical rewrite changes subj only — (pred, obj, span linkage)
    survives, and every original triple has a canonical twin."""
    docs_pdf, ents_pdf = corpus_small
    docs = documents_to_spark(spark, docs_pdf)
    out = build_kg(docs, ents_pdf, PipelineConfig())
    assert out["canonical_triples"].count() == out["triples"].count()
    objs = lambda df: sorted(  # noqa: E731
        (r["pred"], r["obj"]) for r in df.select("pred", "obj").collect()
    )
    assert objs(out["canonical_triples"]) == objs(out["triples"])
