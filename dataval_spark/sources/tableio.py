"""TableIO seam: Iceberg catalog when the runtime jar is present, plain
partitioned Parquet otherwise.

The north rule targets Iceberg tables; the sandbox's PySpark 4.1.2 ships
no Iceberg runtime jar (verified against site-packages/pyspark/jars), so
every read/write goes through this seam:

* Iceberg available  -> ``spark.read.format('iceberg').load(name)`` /
  ``df.writeTo(name).createOrReplace()`` — snapshot-atomic commits give
  the manifest/resume semantics for free.
* Parquet fallback   -> path-based tables, ``partitionBy`` on the verdict
  partition column, append mode; atomicity is per-file and resume
  idempotence comes from the manifest keying (manifest.py).

Nothing else in the engine knows which backend is active.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


class TableIO:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        catalog: str | None = None,
        snapshots: bool = False,
    ):
        """``snapshots=True`` routes the Parquet branch through
        sources/snapshots.SnapshotTable — snapshot-atomic commits,
        optimistic concurrency, and time travel with no Iceberg jar
        (the closest local equivalent of the Iceberg branch's
        guarantees). Ignored when a real Iceberg catalog is active."""
        self.spark = spark
        self.warehouse = warehouse
        self.catalog = catalog
        self.use_iceberg = catalog is not None and iceberg_available(spark)
        self.use_snapshots = snapshots and not self.use_iceberg

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _snap(self, name: str):
        from dataval_spark.sources.snapshots import SnapshotTable

        return SnapshotTable(self.spark, self._path(name))

    def exists(self, name: str) -> bool:
        """Table-existence probe (reference sqlite_master probe,
        /root/reference/dataval/dataval.py:107). Asks Spark, not os.path,
        so s3a:// / hdfs:// warehouses behave the same as local ones
        (mirrors manifest.read_manifest). Not-found and
        empty-dir/no-schema read as False; any OTHER failure (permissions,
        corruption) propagates rather than masquerading as absence."""
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        if self.use_snapshots:
            return self._snap(name).exists()
        try:
            self.spark.read.parquet(self._path(name)).schema
            return True
        except Exception as e:
            msg = str(e)
            if (
                "PATH_NOT_FOUND" in msg
                or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg
            ):
                return False
            raise

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(f"{self.catalog}.{name}")
        if self.use_snapshots:
            return self._snap(name).read()
        return self.spark.read.parquet(self._path(name))

    def replace(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        """Create-or-replace (reference DROP+CREATE verdict table,
        /root/reference/dataval/dataval.py:152-177)."""
        if self.use_iceberg:
            w = df.writeTo(f"{self.catalog}.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        if self.use_snapshots:
            self._snap(name).overwrite(df, partition_by=partition_by)
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def append(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        """Incremental append (reference commit-every-100 batching,
        /root/reference/run_package_release.py:283-317 — here one atomic
        commit per partition/snapshot)."""
        if self.use_iceberg:
            df.writeTo(f"{self.catalog}.{name}").append()
            return
        if self.use_snapshots:
            self._snap(name).append(df, partition_by=partition_by)
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))
