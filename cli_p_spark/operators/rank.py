"""Rank fusion for multi-strategy retrieval: Reciprocal Rank Fusion
(Cormack, Clarke & Buettcher, SIGIR 2009).

The reference engine answers similarity queries with a single faiss
ranking (query-index.py:111); production retrieval fuses SEVERAL
rankings (exact cosine, ANN shortlist, keyword BM25, recency...) and
RRF is the standard parameter-light fusion:

    rrf(d) = sum over rankings r of  1 / (c + rank_r(d))

Cross-engine exactness: each term is one int->double division
(correctly rounded under IEEE-754), and the sum is a FIXED-ARITY
expression (one add per extra ranking, same association order in Spark
and the SQL twin) — no aggregation-order nondeterminism, so fused
scores are bit-identical across engines.  Documents missing from a
ranking contribute 0 (the standard convention).

Scale shape: one full-outer join on (group, id) co-partitions the two
rank lists (each already only k rows per group), then a per-group
top-k window over <= 2k rows — the fusion cost tracks the RANK LISTS,
never the corpus.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .topk import topk_per_group


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    c: int = 60,
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse two rank lists (group_cols..., id_col, rank_col; rank is
    1-based) into (group_cols..., id, rrf_score, fused_rank), top-k per
    group by (rrf_score DESC, id ASC)."""
    keys = [*group_cols, id_col]
    ra = a.select(*keys, F.col(rank_col).alias("_ra"))
    rb = b.select(*keys, F.col(rank_col).alias("_rb"))
    joined = ra.join(rb, keys, "full_outer")
    score = F.coalesce(
        F.lit(1.0) / (F.lit(c) + F.col("_ra")).cast("double"), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(c) + F.col("_rb")).cast("double"), F.lit(0.0)
    )
    scored = joined.select(*keys, score.alias("rrf_score"))
    top = topk_per_group(
        scored,
        group_cols,
        "rrf_score",
        k=k,
        tiebreak_cols=[id_col],
        rank_col="fused_rank",
    )
    return top.select(*keys, "rrf_score", "fused_rank")


def rrf_sql(
    a_sql: str,
    b_sql: str,
    group_cols: list[str],
    id_col: str,
    k: int,
    c: int = 60,
) -> str:
    """DuckDB twin: ``a_sql`` / ``b_sql`` select (group_cols..., id_col,
    rank).  Same fixed-order two-term sum, same (score DESC, id) top-k."""
    keys = [*group_cols, id_col]
    using = ", ".join(keys)
    gsel = "".join(
        f"COALESCE(a.{col}, b.{col}) AS {col}, " for col in keys
    )
    part = ", ".join(f"s.{col}" for col in group_cols)
    return f"""
WITH ra AS ({a_sql}),
rb AS ({b_sql}),
fused AS (
  SELECT {gsel}
         COALESCE(1.0::DOUBLE / CAST({c} + a.rank AS DOUBLE), 0.0::DOUBLE)
           + COALESCE(1.0::DOUBLE / CAST({c} + b.rank AS DOUBLE),
                      0.0::DOUBLE) AS rrf_score
  FROM ra a FULL OUTER JOIN rb b USING ({using})),
ranked AS (
  SELECT s.*, ROW_NUMBER() OVER (
           PARTITION BY {part}
           ORDER BY s.rrf_score DESC, s.{id_col} ASC) AS fused_rank
  FROM fused s)
SELECT {using}, rrf_score, CAST(fused_rank AS INTEGER) AS fused_rank
FROM ranked WHERE fused_rank <= {k}
"""
