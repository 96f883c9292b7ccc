"""Streaming heavy-hitter maintenance: a Count-Min sketch plus
candidate set kept up to date by a file-source stream, replay-safe
under foreachBatch's at-least-once contract.

The reference has no frequency surface at all; a corpus pipeline needs
one the moment it streams (which tokens / entities / mention surfaces
are exploding right now, without holding per-key state for 10^9 keys).
The CMS is the right streaming object because its merge is counter
ADDITION — but addition is exactly what at-least-once replay breaks
(a re-run batch double-counts).  The fix here is structural, the same
one storage engines use: per-batch partial sketches land in a
``batch_id=N`` partition written with DYNAMIC partition overwrite, so
replaying batch N rewrites partition N byte-for-byte instead of adding
to it — the accumulated state is idempotent in the batch, and the
merged sketch is just sum over partitions at read time.

Candidate set: a CMS estimates counts but cannot enumerate keys, so
each batch also persists its exact per-batch top-M keys (M >>
global k).  Any global heavy hitter must be heavy in at least one
batch for this to recall it — the standard CMS+candidates contract;
size M accordingly (a key with global share s has per-batch expected
share s under any split that isn't adversarially anti-correlated).

Scale shape: per batch ONE groupBy over the batch's keys (map-side
combined) producing <= depth*width counter rows + M candidate rows —
state on disk is O(batches * (depth*width + M)) regardless of corpus
size; the read-side merge is a groupBy over those small partitions.
Compact by replacing old partitions with their pre-summed union when
batch count grows large (same overwrite mechanism)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _cms_batch_writer(
    state_dir: str,
    key_col: str,
    depth: int,
    width: int,
    cand_per_batch: int,
):
    """The foreachBatch body, exposed for direct replay testing."""
    from ..operators.sketch import cms_positions

    def process_batch(batch_df: DataFrame, batch_id: int):
        keys = batch_df.select(F.col(key_col).alias("_k")).filter(
            F.col("_k").isNotNull()
        )
        pos = cms_positions(keys, "_k", depth, width)
        counters = (
            pos.groupBy("_j", "_pos")
            .agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        (
            counters.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{state_dir}/counters")
        )
        cand = (
            keys.groupBy("_k")
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.desc("_n"), "_k")
            .limit(cand_per_batch)
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        (
            cand.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{state_dir}/candidates")
        )

    return process_batch


def incremental_cms_stream(
    keys_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "token",
    depth: int = 4,
    width: int = 2048,
    cand_per_batch: int = 256,
):
    """Start the sketch-maintenance stream over a stream of key rows
    (tokenize upstream — one row per occurrence); returns the
    StreamingQuery.  Source progress checkpoints to ``checkpoint_dir``;
    killed runs resume at the failed batch, whose partition the replay
    overwrites (see module docstring)."""
    return (
        keys_stream.writeStream.foreachBatch(
            _cms_batch_writer(
                state_dir, key_col, depth, width, cand_per_batch
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_state_counters(spark: SparkSession, state_dir: str) -> DataFrame:
    """(_j, _pos, _c): the merged sketch — counter addition over every
    batch partition."""
    return (
        spark.read.parquet(f"{state_dir}/counters")
        .groupBy("_j", "_pos")
        .agg(F.sum("_c").alias("_c"))
    )


def streaming_heavy_hitters(
    spark: SparkSession,
    state_dir: str,
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """(key, cms_count): top-k accumulated candidates by CMS estimate
    (min over depth counters; ties broken by key — deterministic).
    depth/width must match the values the stream was started with."""
    from ..operators.sketch import cms_positions

    sketch = cms_state_counters(spark, state_dir)
    cand = (
        spark.read.parquet(f"{state_dir}/candidates")
        .select("_k")
        .distinct()
    )
    pos = cms_positions(cand, "_k", depth, width)
    est = (
        pos.join(sketch, ["_j", "_pos"], "left")
        .groupBy("_k")
        .agg(
            F.min(F.coalesce(F.col("_c"), F.lit(0))).alias("cms_count")
        )
    )
    return (
        est.orderBy(F.desc("cms_count"), "_k")
        .limit(k)
        .select(F.col("_k").alias("key"), "cms_count")
    )
