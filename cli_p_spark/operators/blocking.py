"""Entity-resolution candidate generation: sorted-neighborhood blocking.

Before an entity-linking or dedup stage can score pairs, something must
PROPOSE pairs without the O(n^2) cross join.  This repo already has the
hash-family blockers (MinHash-LSH in operators/lsh.py, SimHash bands,
prefix-filtered set-similarity in operators/dedup.py); sorted
neighborhood (Hernandez & Stolfo, SIGMOD'95 "The merge/purge problem")
is the classic complementary scheme: sort records by a blocking key and
pair every record with its ``window - 1`` successors — catches
near-misses that share sort-order locality but no exact hash bucket.

Spark-first shape: the textbook formulation sorts the WHOLE dataset
globally, which on a cluster means one total-order sort whose windowed
self-pairing crosses partition boundaries.  The scalable variant
implemented here is multi-pass/blocked SNM: rows sharing a coarse
blocking key are sorted WITHIN the key (one hash shuffle on the key,
per-key windows — no global total order, no single-partition window),
and the slide runs inside each block.  Production practice runs several
passes with different keys (the multi-pass SNM of the original paper);
each pass is one call.

Reference scope: CLI-P proposes candidates only via its faiss index
(query-index.py:60-77); key-locality blocking is the ER extension a KG
pipeline needs for records embeddings mishandle (serial numbers, names
with typos in the embedding-OOV tail).

Skew note: work per block is O(m * window); a degenerate key (one giant
block) degrades toward the quadratic it is meant to avoid only if
window ~ m — window is a small constant, so a hot block costs
m * window, linear in the block, and the key shuffle is AQE-skew-
splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col,
    sort_col,
    id_col: str,
    window: int = 3,
) -> DataFrame:
    """(block_key, id_a, id_b, rank_gap): candidate pairs where both
    rows share ``key_col`` and sit within ``window - 1`` positions in
    the (sort_col, id_col) order inside the block; id_a is the earlier
    row.  ``key_col``/``sort_col`` accept a column name or a Column
    expression (derive the blocking key inline).  The (sort, id) order
    is total (id tiebreak), so ranks — and therefore the emitted pair
    set — are deterministic and engine-reproducible.

    Plan: one window shuffle on the key to rank, then the left side
    EXPLODES over gaps 1..window-1 and equi-joins on (key, rank) — the
    join key carries the rank, so matched pairs are exactly the emitted
    pairs, O(m * window) per block.  (A join on the key alone with the
    rank range as a residual predicate would enumerate every same-key
    row pair — O(m^2) per block, the quadratic SNM exists to avoid.)

    NULL discipline: rows are ranked with NULLS LAST on both the sort
    and id expressions, and the DuckDB twin pins the same order —
    Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST, a
    silent cross-engine rank shift otherwise (the sketch.py:137 class
    of divergence)."""
    if window < 2:
        raise ValueError("window must be >= 2 (a pair needs two rows)")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    srt = F.col(sort_col) if isinstance(sort_col, str) else sort_col
    ranked = df.select(
        key.alias("_k"),
        srt.alias("_s"),
        F.col(id_col).alias("_id"),
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_k").orderBy(
                F.col("_s").asc_nulls_last(), F.col("_id").asc_nulls_last()
            )
        ),
    )
    a = ranked.select(
        F.col("_k").alias("block_key"),
        F.col("_id").alias("id_a"),
        F.col("_rn").alias("_ra"),
    ).withColumn(
        "rank_gap",
        F.explode(F.sequence(F.lit(1), F.lit(int(window) - 1))),
    ).withColumn("_rb", F.col("_ra") + F.col("rank_gap"))
    b = ranked.select(
        F.col("_k").alias("block_key"),
        F.col("_id").alias("id_b"),
        F.col("_rn").alias("_rb"),
    )
    return a.join(b, ["block_key", "_rb"]).select(
        "block_key", "id_a", "id_b", "rank_gap"
    )


def sorted_neighborhood_sql(
    rel: str,
    key_sql: str,
    sort_sql: str,
    id_sql: str,
    window: int = 3,
) -> str:
    """DuckDB twin of sorted_neighborhood_pairs: same per-key
    ROW_NUMBER over the same total order (NULLS LAST pinned — DuckDB's
    default, Spark's is not), same rank-window pair set; the range join
    form here is the SEMANTIC spec (the Spark side equi-joins on
    (key, rank) for the O(m*window) plan — same pairs).
    ``key_sql``/``sort_sql``/``id_sql`` are SQL expressions over
    ``rel``'s columns."""
    return f"""
WITH ranked AS (
  SELECT {key_sql} AS k, {id_sql} AS id,
         ROW_NUMBER() OVER (PARTITION BY {key_sql}
                            ORDER BY {sort_sql} NULLS LAST,
                                     {id_sql} NULLS LAST) AS rn
  FROM {rel})
SELECT a.k AS block_key, a.id AS id_a, b.id AS id_b,
       b.rn - a.rn AS rank_gap
FROM ranked a JOIN ranked b
  ON b.k = a.k AND b.rn > a.rn AND b.rn <= a.rn + {int(window) - 1}
"""
