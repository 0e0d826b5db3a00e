"""The table-writer seam for checkpointed runs.

plans/checkpoint.py commits three tables per bucket batch: the data
partitions (dynamic partition overwrite), then the watermark append
(the commit point), then the metrics append.  SURVEY.md section 7.4
allows the sandbox to stand these in as parquet directory trees; a
real deployment lands them in Iceberg, whose atomic snapshot swap also
closes the one concurrency hole the stand-in documents (live-live
overwrite of the same bucket partition).

This module isolates that difference behind ``TableWriter`` so the
Iceberg swap is a constructor argument, not a refactor:

* ``ParquetDirWriter``  — the sandbox default: parquet dirs under a
  root, dynamic partition overwrite for data, plain appends for the
  log tables.  Snapshot ids are None (a directory tree has no
  snapshot log).
* ``IcebergTableWriter`` — the deployment shape: ``df.writeTo()``
  against catalog tables (``overwritePartitions`` for data, ``append``
  for the logs) and the committed snapshot id read back from the
  table's snapshot log so checkpoint.run can stamp it into the
  watermark rows.  Needs the iceberg runtime jar + a configured
  catalog; the sandbox has neither, so this class is exercised by the
  RecordingWriter contract test (same call sequence), not end-to-end.
* ``RecordingWriter``   — the test double: wraps another writer,
  records the (method, table) call sequence, and mints deterministic
  snapshot ids so tests can pin both the commit protocol (data BEFORE
  watermark BEFORE metrics, every batch) and the snapshot-id plumbing
  through the watermark rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableWriter:
    """Commit interface checkpoint.run writes through.

    ``overwrite_partitions`` replaces the data partitions the batch
    touched and returns the committed snapshot id (None when the
    backing store has no snapshot log).  ``append`` appends log rows
    (watermarks / metrics).  ``read`` reads a whole table back."""

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_col: str
    ) -> str | None:
        raise NotImplementedError

    def append(self, df: DataFrame, table: str) -> None:
        raise NotImplementedError

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        raise NotImplementedError


class ParquetDirWriter(TableWriter):
    """Parquet-directory stand-in (SURVEY.md section 7.4): tables are
    subdirectories of ``root``; data overwrites are dynamic partition
    overwrites (idempotent bucket replay); appends are plain parquet
    appends.  No snapshot log, so snapshot ids are None."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_col: str
    ) -> str | None:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(
            self._path(table)
        )
        return None

    def append(self, df: DataFrame, table: str) -> None:
        # routed through checkpoint._append so existing crash-injection
        # tests (monkeypatching that seam) keep working unchanged
        from ocr_project_spark.plans import checkpoint

        checkpoint._append(df, self._path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self._path(table))


class IcebergTableWriter(TableWriter):
    """Iceberg deployment shape: tables are ``{namespace}.{table}`` in
    a configured catalog.  Data partitions commit via
    ``writeTo(...).overwritePartitions()`` (the atomic snapshot swap
    that closes the stand-in's live-live overwrite caveat); log tables
    via ``writeTo(...).append()``.  The committed snapshot id is read
    back from the table's ``.snapshots`` metadata table so the caller
    can stamp it into the watermark rows.

    Requires the iceberg-spark-runtime jar and a catalog in the Spark
    conf, e.g.::

        spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.lake.type = hive | hadoop | rest ...

    Neither ships in this sandbox, so this writer is covered by the
    RecordingWriter contract test (identical call sequence), not by an
    end-to-end run — the swap is ``run(..., writer=IcebergTableWriter(
    spark, "lake.extraction"))`` once the jar and catalog exist.
    """

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.namespace = namespace

    def _name(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    def _snapshot_id(self, table: str) -> str | None:
        snaps = self.spark.sql(
            f"SELECT snapshot_id FROM {self._name(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(snaps[0]["snapshot_id"]) if snaps else None

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_col: str
    ) -> str | None:
        df.writeTo(self._name(table)).overwritePartitions()
        return self._snapshot_id(table)

    def append(self, df: DataFrame, table: str) -> None:
        df.writeTo(self._name(table)).append()

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(self._name(table))


class RecordingWriter(TableWriter):
    """Test double pinning the commit protocol: delegates to ``inner``
    (storage behavior unchanged), records every call as
    ``(method, table)`` in ``calls``, and mints deterministic snapshot
    ids ("snap-000001", ...) — one per data commit, exactly what an
    Iceberg commit would return — so tests can assert the watermark
    rows carry the id of the batch that committed them."""

    def __init__(self, inner: TableWriter):
        self.inner = inner
        self.calls: list[tuple[str, str]] = []
        self._n = 0

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_col: str
    ) -> str | None:
        self.inner.overwrite_partitions(df, table, partition_col)
        self._n += 1
        snap = f"snap-{self._n:06d}"
        self.calls.append(("overwrite_partitions", table))
        return snap

    def append(self, df: DataFrame, table: str) -> None:
        self.inner.append(df, table)
        self.calls.append(("append", table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return self.inner.read(spark, table)
