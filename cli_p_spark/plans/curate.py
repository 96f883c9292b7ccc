"""Training-data curation plan: one entry point composing the curation
operators into the standard corpus-cleaning sequence.

    documents -> quality/lang annotation (pure Catalyst)
              -> quality floor filter
              -> exact dedup (content fingerprint, keep min id)
              -> near-dup dedup (MinHash-LSH pairs -> CC -> keep min)
              -> curated corpus + per-stage counts

Everything is a DataFrame transformation; the only UDF is MinHash
(Arrow-batched).  At 100 TB each stage is a pass over the corpus with
one shuffle (the dedup groupBys / banded join); the stage-count report
doubles as the data-loss audit a production curation run needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ccomp import canonical_mapping, connected_components
from ..operators.dedup import minhash_lsh_pairs
from ..functions.text import content_fingerprint, lang_id, quality_score


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.34,
    keep_langs: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.7,
    return_pairs: bool = False,
) -> tuple:
    """Returns (curated_df, stage_counts).

    stage_counts: input -> quality_pass -> lang_pass -> exact_unique ->
    neardup_unique, each the surviving row count after that stage.

    Count discipline (the 100 TB rule): the input is scanned ONCE — the
    annotated frame is cached and the three filter-stage counts fold into
    a single aggregation over it (conditional count_if), so the quality
    UDF runs once per row, not once per stage-count action.  The exact-
    dedup survivor set is cached too (it feeds the count, the MinHash
    pass, the canonical-mapping join, and the final semi-join)."""
    annotated = docs.withColumn("_q", quality_score(text_col)).withColumn(
        "_lang", lang_id(text_col)
    ).persist()
    qpass = F.col("_q") >= min_quality
    lpass = qpass & (
        F.col("_lang").isin(list(keep_langs)) if keep_langs else F.lit(True)
    )
    head = annotated.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(qpass).alias("nq"),
        F.count_if(lpass).alias("nl"),
    ).first()
    counts: dict[str, int] = {
        "input": head["n"],
        "quality_pass": head["nq"],
        "lang_pass": head["nl"],
    }
    q = annotated.filter(lpass)

    # exact dedup: keep the min id per normalized-content fingerprint
    fp = q.withColumn("_fp", content_fingerprint(text_col))
    keep_exact = fp.groupBy("_fp").agg(F.min(id_col).alias("_keep")).select(
        F.col("_fp").alias("_kfp"), "_keep"
    )
    exact = fp.join(
        keep_exact,
        (F.col("_fp") == F.col("_kfp")) & (F.col(id_col) == F.col("_keep")),
        "left_semi",
    )
    ided = exact.withColumn("_sid", F.col(id_col).cast("string")).persist()
    counts["exact_unique"] = ided.count()
    annotated.unpersist()

    # near-dup dedup: MinHash-LSH pairs -> CC -> keep min-id per cluster
    pairs = minhash_lsh_pairs(
        ided, text_col, "_sid", jaccard_threshold=jaccard_threshold
    )
    comps = connected_components(pairs.select("src", "dst"))
    mapping = canonical_mapping(
        comps, ided.select(F.col("_sid").alias("node"))
    )
    keep = mapping.filter(F.col("node") == F.col("canonical_id")).select(
        F.col("node").alias("_keep")
    )
    curated = ided.join(
        keep, ided["_sid"] == F.col("_keep"), "left_semi"
    ).drop("_sid", "_fp")
    counts["neardup_unique"] = curated.count()
    # ided stays cached: the returned frame reads through it; callers
    # that persist/write `curated` may unpersist afterwards
    if return_pairs:
        # expose the near-dup pair set (audit / oracle replay of the
        # CC + keep-min resolution over the same pairs).  The signature
        # cache rides along — the caller unpersists after consuming
        # `pairs` (re-reads after that recompute, still correct).
        return curated, counts, pairs
    pairs.signature_cache.unpersist()
    return curated, counts
