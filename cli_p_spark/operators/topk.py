"""Per-group top-k — the engine's replacement for faiss result ranking.

The reference gets (scores, ids) pre-sorted from index.search
(query-index.py:111,114-116) and paginates with an offset window.  In the
DataFrame engine the same semantics are a rank window:

    row_number() OVER (PARTITION BY group ORDER BY score DESC, tiebreak ASC)
        BETWEEN offset+1 AND offset+k

row_number (not rank/dense_rank) + a deterministic tiebreak column makes
the result reproducible across partitionings — required for the P/R gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str | Column,
    k: int,
    tiebreak_cols: list[str] | None = None,
    offset: int = 0,
    rank_col: str = "rank",
    descending: bool = True,
) -> DataFrame:
    """Keep rows ranked (offset, offset+k] within each group.

    Pagination semantics match the reference REPL: search k+offset, skip
    the first offset (query-index.py:111,114-116).
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    ordering = [order.desc() if descending else order.asc()]
    for c in tiebreak_cols or []:
        ordering.append(F.col(c).asc())
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter((F.col(rank_col) > offset) & (F.col(rank_col) <= offset + k))
        .withColumn(rank_col, F.col(rank_col) - F.lit(offset))
    )
