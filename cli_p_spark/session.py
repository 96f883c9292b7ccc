"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB target, not just local tests: AQE on
(runtime coalescing + skew-join splitting — the north_rule's 'AQE-handled
skew joins in linking'), Arrow on for pandas-UDF batches (the encoder hot
path), and a bounded Arrow batch size playing the role of the reference's
RAM-bound chunking (build-index.py:14-15: 20k x 512 blocks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "cli_p_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", "32")
    )
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # shuffled-hash join when its size conditions fit: skips the
        # per-partition sorts of sort-merge — a win wherever one side of
        # an equi-join is moderately small per partition (candidate
        # verify joins, dim joins past the broadcast cap).  AQE still
        # guards the build side; SPARK_GRAFT_PREFER_SMJ=1 restores the
        # sort-merge default for memory-tight deployments.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "true"
            if os.environ.get("SPARK_GRAFT_PREFER_SMJ", "0") == "1"
            else "false",
        )
        # bounded Arrow batches ~ reference's split_table chunking
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-scale file splits: default 128MB bins collapse a small
        # corpus into 1-2 scan tasks, serializing the pre-shuffle map side
        # (at warehouse scale files are plentiful and this barely matters)
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
