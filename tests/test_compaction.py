"""Small-file compaction: fewer files, identical data
(plans/compaction.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_project_spark.operators.extract import extract
from ocr_project_spark.plans.compaction import compact_output
from ocr_project_spark.plans.partitioning import with_bucket


def to_dict(df):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in (r["spans"] or [])
        ]
        for r in df.collect()
    }


def test_compaction_reduces_files_preserves_rows(spark, corpus_dfs, tmp_path):
    docs_df, cands_df = corpus_dfs
    out = with_bucket(extract(docs_df, cands_df), 4)
    path = str(tmp_path / "extracted")
    # deliberately fragment: 12 writer tasks per bucket
    out.repartition(12).write.partitionBy("bucket").parquet(path)

    baseline = to_dict(spark.read.parquet(path).drop("bucket"))
    stats = compact_output(spark, path, target_bytes=64 * 1024 * 1024,
                           min_files_to_compact=3)
    assert stats["buckets_compacted"] == 4
    assert stats["files_after"] < stats["files_before"]
    got = to_dict(spark.read.parquet(path).drop("bucket"))
    assert got == baseline

    # idempotent: second run is a no-op (everything already compact)
    stats2 = compact_output(spark, path, target_bytes=64 * 1024 * 1024,
                            min_files_to_compact=3)
    assert stats2["buckets_compacted"] == 0
    assert to_dict(spark.read.parquet(path).drop("bucket")) == baseline
