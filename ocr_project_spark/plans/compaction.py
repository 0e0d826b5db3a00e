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

from pyspark.sql import DataFrame, SparkSession
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
        max_bytes = max(s for _, s in victims.values())
        n_out_files = max(1, -(-max_bytes // target_bytes))  # ceil
        (
            batch.repartition(n_out_files * len(victims), "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(table_path)
        )
    after = _bucket_stats(table_path)
    return {
        "buckets_compacted": len(victims),
        "files_before": files_before,
        "files_after": sum(n for n, _ in after.values()),
    }
