"""Thin table-store abstraction: parquet directories today, Iceberg by
config flip (SURVEY.md §7 hard part (e)).

The north_rule targets partitioned Iceberg graph tables with snapshot
isolation (fixing the reference's documented concurrent-build corruption,
README.md:46-51).  The iceberg-spark runtime jar is not present in this
sandbox, so the default backend lays out Iceberg-shaped partitioned
parquet directories under a base path; when a Spark catalog is configured
(``spark.sql.catalog.<name>`` pointing at an Iceberg catalog), the same
calls route through the DataFrameWriterV2 ``writeTo`` API — appends become
Iceberg snapshot commits and resume reads become time-travel-safe.

Only this module touches storage paths; operators and plans speak in
logical table names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, spark: SparkSession, base: str,
                 catalog: str | None = None):
        self.spark = spark
        self.base = base.rstrip("/")
        # config flip: pass an Iceberg catalog name (and have the catalog
        # configured on the session) to switch every write to writeTo()
        self.catalog = catalog

    # -- naming -----------------------------------------------------------
    def _path(self, table: str) -> str:
        return f"{self.base}/{table}"

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{table}"

    # -- writes -----------------------------------------------------------
    def append(self, df: DataFrame, table: str,
               partition_by: tuple[str, ...] = ()) -> None:
        if self.catalog:
            w = df.writeTo(self._ident(table))
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace() if not self.exists(table) else w.append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        if self.catalog:
            df.writeTo(self._ident(table)).createOrReplace()
            return
        df.write.mode("overwrite").parquet(self._path(table))

    # -- reads ------------------------------------------------------------
    def read(self, table: str) -> DataFrame | None:
        try:
            if self.catalog:
                return self.spark.read.table(self._ident(table))
            return self.spark.read.parquet(self._path(table))
        except Exception:
            return None

    def exists(self, table: str) -> bool:
        return self.read(table) is not None
