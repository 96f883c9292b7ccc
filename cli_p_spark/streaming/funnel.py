"""Streaming incremental funnel: continuous per-user funnel state over
an event file stream.

The batch funnel (operators/funnel.py) is a LEFT FOLD of the chained-min
recurrence over each user's time-ordered events — so a stream of
time-ordered drops can fold batch-by-batch into a tiny per-user state
(k timestamps) and ALWAYS equal the batch funnel over everything seen
so far (the streamed==batch theorem; gated in tests/test_streaming).
Late events that time-travel BEFORE already-folded state are the one
thing the incremental form cannot honor (the fold is order-sensitive);
that caveat is inherent to incremental funnels and documented here —
bound it upstream with a watermark-delayed source if drops can
interleave.

State storage is VERSIONED: batch b writes `{state_dir}/v{b}` and the
next batch reads the newest version with a `_SUCCESS` marker strictly
below its own batch id.  A replayed batch b therefore re-reads the same
predecessor it read the first time and overwrites v{b} with the same
deterministic bytes — and the fold itself is replay-idempotent anyway
(fold_funnel_state's proof sketch: re-applied events can never advance
a slot filled by a later-or-equal-timestamped event).  Old versions are
a compaction concern for long-running streams (drop all but the latest
N committed versions out-of-band); each version holds one row per user
seen so far.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _latest_state(
    spark: SparkSession, state_dir: str, below_batch: int
) -> DataFrame | None:
    """Newest committed (has _SUCCESS) state version with id <
    ``below_batch``, or None.  FS errors other than does-not-exist
    propagate — foreachBatch then fails the batch and the checkpoint
    replays it."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(root):
        return None
    best = -1
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("v"):
            continue
        try:
            vid = int(name[1:])
        except ValueError:
            continue
        if vid >= below_batch:
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{state_dir}/{name}/_SUCCESS")
        ) and vid > best:
            best = vid
    if best < 0:
        return None
    return spark.read.parquet(f"{state_dir}/v{best}")


def incremental_funnel_stream(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_us: int | None = None,
):
    """Maintain per-user funnel state over a streaming event source;
    returns the StreamingQuery.  Each micro-batch folds into the stored
    state via fold_funnel_state (work tracks the BATCH plus one join
    against the state table) and commits a new state version; funnel
    counts at any moment = state_to_counts over the latest version."""
    from ..operators.funnel import fold_funnel_state

    spark = events_stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        state = _latest_state(spark, state_dir, batch_id)
        new_state = fold_funnel_state(
            batch_df,
            state,
            steps,
            user_col=user_col,
            ts_col=ts_col,
            type_col=type_col,
            window_us=window_us,
        )
        new_state.write.mode("overwrite").parquet(
            f"{state_dir}/v{batch_id}"
        )

    return (
        events_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
