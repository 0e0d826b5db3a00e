"""Small-file compaction for the bucket-partitioned output table.

At 10^12 documents the checkpointed writer (plans/checkpoint.py)
produces one file set per (bucket, task) — after many incremental runs
a bucket directory accumulates thousands of small parquet files, and
scan task count explodes.  Compaction rewrites each oversized bucket
partition into ~target-size files.

Sandbox note: file listing uses the local filesystem walk; a real
deployment swaps `_bucket_stats` for the Hadoop FileSystem listing (or
simply Iceberg's `rewrite_data_files` procedure, which is this exact
operation with snapshot-atomic commits).  The rewrite itself is the
same idempotent dynamic-partition-overwrite the checkpoint replay uses:
re-running a crashed compaction converges.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _bucket_stats(table_path: str) -> dict[int, tuple[int, int]]:
    """{bucket: (n_files, total_bytes)} from the partition dir layout."""
    out: dict[int, tuple[int, int]] = {}
    if not os.path.isdir(table_path):
        return out
    for entry in os.listdir(table_path):
        if not entry.startswith("bucket="):
            continue
        b = int(entry.split("=", 1)[1])
        n, size = 0, 0
        for fn in os.listdir(os.path.join(table_path, entry)):
            if fn.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(table_path, entry, fn))
        out[b] = (n, size)
    return out


def compact_output(
    spark: SparkSession,
    table_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> dict:
    """Rewrite bucket partitions that have more than
    ``min_files_to_compact`` files into ceil(bytes/target) files each.

    Returns {"buckets_compacted": n, "files_before": x, "files_after": y}.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    before = _bucket_stats(table_path)
    victims = {
        b: stats for b, stats in before.items() if stats[0] > min_files_to_compact
    }
    files_before = sum(n for n, _ in before.values())
    if victims:
        df = spark.read.parquet(table_path)
        batch = df.where(F.col("bucket").isin(list(victims)))
        # Per-bucket fan-out: bucket b rewrites into
        # ceil(bucket_bytes/target) files — NOT a single repartition on
        # the bucket column (which collapses each bucket into one task
        # and therefore one file of arbitrary size, destroying scan
        # parallelism for oversized buckets).
        n_files = {
            b: max(1, -(-size // target_bytes)) for b, (_, size) in victims.items()
        }
        offsets: dict[int, int] = {}
        total = 0
        for b in sorted(n_files):
            offsets[b] = total
            total += n_files[b]
        n_map = F.create_map(
            *[F.lit(v) for b in sorted(n_files) for v in (b, n_files[b])]
        )
        off_map = F.create_map(
            *[F.lit(v) for b in sorted(offsets) for v in (b, offsets[b])]
        )
        # Global file index 0..total-1 = bucket offset + per-bucket split
        # derived from row content (deterministic under task retry);
        # range-partitioning on it gives each index its own writer task
        # with no hash collisions, so each bucket fans out to ~target
        # sized files.
        file_idx = off_map[F.col("bucket")] + F.pmod(
            F.xxhash64(F.col("doc_id")), n_map[F.col("bucket")]
        )
        # Backstop for range-sampler boundary merges: cap records per
        # output file at ~1.25x the largest intended per-file row count.
        rows = dict(
            batch.groupBy("bucket").count().collect()
        )  # metadata-scale: one row per victim bucket
        max_rows_per_file = max(
            -(-rows.get(b, 0) // n_files[b]) for b in n_files
        )
        (
            batch.withColumn("_file_idx", file_idx)
            .repartitionByRange(max(1, total), "_file_idx")
            .drop("_file_idx")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", int(max_rows_per_file * 1.25) + 1)
            .partitionBy("bucket")
            .parquet(table_path)
        )
    after = _bucket_stats(table_path)
    return {
        "buckets_compacted": len(victims),
        "files_before": files_before,
        "files_after": sum(n for n, _ in after.values()),
        "per_bucket_after": {b: after[b][0] for b in victims if b in after},
        "per_bucket_target": (
            {b: int(n) for b, n in n_files.items()} if victims else {}
        ),
    }
