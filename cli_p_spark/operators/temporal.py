"""Temporal operators: interval overlap join, interval coalescing
(gaps-and-islands), bitemporal snapshot.

The reference's data model is point-in-time only (a file's mtime is the
closest it gets — build-index.py walks a directory tree, no validity
windows), but a KG built from evolving sources immediately needs
interval semantics: "which facts were asserted while this document was
current", "collapse a mention's sighting windows", "what did the graph
say as of system time S about valid time V".  These operators provide
that layer over plain integer interval columns.

Determinism design: intervals are INTEGERS (epoch days / epoch seconds
— caller casts), all predicates are integer comparisons, and the
overlap join's bucketing is an internal mechanism that provably does
not change the result set (emit-once: each overlapping pair survives
in exactly one shared bucket), so a DuckDB oracle can verify with the
PLAIN non-equi join — semantics, not mechanics.

Scale shape (interval_join): a naive overlap join is a per-key cross
join; Spark's optimizer will at best broadcast-nested-loop it.  Here
both sides explode to (key, bucket) for the buckets each interval
covers and equi-join on that pair — shuffle-partitionable, AQE-skew-
splittable, and the work tracks sum(span/bucket_width) replication
plus true candidate pairs, not |L|x|R| per key.  Long intervals are
the skew risk: replication factor is ceil(span / bucket_width), so
pick bucket_width near the TYPICAL span; pathological spans should be
clipped or handled on a broadcast side channel by the caller."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int = 32,
) -> DataFrame:
    """Pairs (left row, right row) sharing the key columns ``on`` whose
    half-open integer intervals [l_start, l_end) and [r_start, r_end)
    overlap: l_start < r_end AND r_start < l_end.

    Output columns: ``on`` once, then all non-key columns of both
    inputs — start/end column names must therefore differ between the
    two frames (rename before calling).

    Each side explodes its interval into the covered bucket ids
    (monotone integer `div` — any monotone bucket function works, the
    two sides and the emit-once predicate just have to agree), the
    equi-join runs on (key..., bucket), and a pair is EMITTED only in
    the bucket containing max(l_start, r_start) — which both intervals
    provably cover when they overlap — so the result needs no
    `distinct` pass.  Requires start < end and start >= 0 on both
    sides (trunc-div == floor-div on non-negatives)."""
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def _bucketed(df, s, e):
        # enforce the non-empty precondition: an empty [x, x) interval
        # overlaps nothing, but the max(s) < min(e) predicate would
        # claim it does, and sequence() would run DESCENDING on it
        return df.filter(F.col(s) < F.col(e)).withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.expr(f"{s} div {w}"), F.expr(f"({e} - 1) div {w}")
                )
            ),
        )

    lb = _bucketed(left, l_start, l_end)
    rb = _bucketed(right, r_start, r_end)
    emit_bucket = F.expr(f"greatest({l_start}, {r_start}) div {w}")
    return (
        lb.join(rb, on + ["_b"])
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
        )
        .filter(F.col("_b") == emit_bucket)
        .drop("_b")
    )


def interval_join_sql(
    left_rel: str,
    right_rel: str,
    on: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    select_sql: str = "l.*",
) -> str:
    """DuckDB oracle: the PLAIN overlap join — verifies the emit-once
    bucketing machinery against the declarative semantics.
    ``select_sql`` projects over aliases l / r."""
    keys = " AND ".join(f"l.{k} = r.{k}" for k in on)
    return f"""
SELECT {select_sql}
FROM {left_rel} l JOIN {right_rel} r
  ON {keys}
 AND l.{l_start} < r.{r_end} AND r.{r_start} < l.{l_end}
"""


def temporal_coalesce(
    df: DataFrame,
    keys: list[str],
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """(keys..., island_start, island_end, n_rows) — merge overlapping
    or touching half-open integer intervals per key into maximal
    islands (classic gaps-and-islands).  An interval starts a new
    island iff its start exceeds the running max end of all earlier
    intervals (ordered by start, end); island id = running count of
    starts.  Two window passes + one groupBy — integer comparisons
    only, bit-exact cross-engine; ``temporal_coalesce_sql`` is the
    identical window pipeline.

    Scale shape: windows partition by key (one shuffle shared with the
    final groupBy's key prefix); per-key state is the sort — fine for
    bounded per-key interval counts, repartition-range for giant
    single keys."""
    w = Window.partitionBy(*keys).orderBy(start, end)
    prev_max = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new",
        F.when(
            prev_max.isNull() | (F.col(start) > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("_island", F.sum("_new").over(w))
    return flagged.groupBy(*keys, "_island").agg(
        F.min(start).alias("island_start"),
        F.max(end).alias("island_end"),
        F.count(F.lit(1)).alias("n_rows"),
    ).drop("_island")


def temporal_coalesce_sql(
    source_rel: str,
    keys: list[str],
    start: str = "start",
    end: str = "end",
) -> str:
    """DuckDB twin of temporal_coalesce (same window pipeline)."""
    ks = ", ".join(keys)
    return f"""
WITH flagged AS (
  SELECT {ks}, {start}, {end},
         CASE WHEN MAX({end}) OVER (
                PARTITION BY {ks} ORDER BY {start}, {end}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              IS NOT DISTINCT FROM NULL
           OR {start} > MAX({end}) OVER (
                PARTITION BY {ks} ORDER BY {start}, {end}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS nw
  FROM {source_rel}),
islands AS (
  SELECT {ks}, {start}, {end},
         SUM(nw) OVER (PARTITION BY {ks} ORDER BY {start}, {end}
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged)
SELECT {ks},
       MIN({start}) AS island_start,
       MAX({end}) AS island_end,
       COUNT(*) AS n_rows
FROM islands GROUP BY {ks}, island
"""


def bitemporal_snapshot(
    versions: DataFrame,
    sys_from: str,
    sys_to: str,
    valid_from: str,
    valid_to: str,
    system_time: int,
    valid_time: int,
) -> DataFrame:
    """Rows visible at (system_time, valid_time): the version recorded
    as of system_time (sys_from <= S < sys_to, NULL sys_to = still
    current) whose validity interval covers valid_time (valid_from <=
    V < valid_to).  Half-open integer intervals throughout.

    Precondition (the bitemporal invariant an append-only version
    table maintains): per logical key, system intervals of versions
    with overlapping validity are disjoint — so the filter alone
    yields at most one row per (key, covered valid point) and no
    tie-break is needed.  A pure filter: predicate-pushdown reaches
    the scan, nothing shuffles."""
    s, v = int(system_time), int(valid_time)
    return versions.filter(
        (F.col(sys_from) <= F.lit(s))
        & (
            F.col(sys_to).isNull()
            | (F.lit(s) < F.col(sys_to))
        )
        & (F.col(valid_from) <= F.lit(v))
        & (F.lit(v) < F.col(valid_to))
    )


def bitemporal_snapshot_sql(
    versions_rel: str,
    sys_from: str,
    sys_to: str,
    valid_from: str,
    valid_to: str,
    system_time: int,
    valid_time: int,
) -> str:
    """DuckDB twin of bitemporal_snapshot (same predicate)."""
    s, v = int(system_time), int(valid_time)
    return f"""
SELECT * FROM {versions_rel}
WHERE {sys_from} <= {s}
  AND ({sys_to} IS NULL OR {s} < {sys_to})
  AND {valid_from} <= {v} AND {v} < {valid_to}
"""
