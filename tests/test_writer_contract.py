"""The Iceberg-swap contract: checkpoint.run commits through the
plans/writer.TableWriter seam with a pinned call sequence — data
partition overwrite, THEN watermark append (the commit point), THEN
metrics append, per bucket batch — and stamps the data commit's
snapshot id into that batch's watermark rows.  RecordingWriter plays
the Iceberg role (mints snapshot ids) while delegating storage to the
parquet stand-in, so the real swap (IcebergTableWriter) is a
constructor argument, not a refactor."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_project_spark.plans import checkpoint
from ocr_project_spark.plans.writer import ParquetDirWriter, RecordingWriter


@pytest.fixture
def recording_run(spark, corpus_dfs, tmp_path):
    docs_df, cands_df = corpus_dfs
    ck = str(tmp_path / "ck_writer")
    rec = RecordingWriter(ParquetDirWriter(ck))
    out = checkpoint.run(
        spark, docs_df, ck, "rw", candidates=cands_df,
        n_buckets=8, bucket_batch_size=2, writer=rec,
    )
    return rec, out, ck


def test_commit_call_sequence(recording_run):
    """Every batch commits data BEFORE its watermark BEFORE its
    metrics — the crash-atomicity ordering the module docstring argues
    (a crash in the gap leaves orphaned-but-uncommitted data, never a
    watermark without data)."""
    rec, _, _ = recording_run
    per_batch = [
        ("overwrite_partitions", checkpoint.OUTPUT_TABLE),
        ("append", checkpoint.WATERMARK_TABLE),
        ("append", checkpoint.METRICS_TABLE),
    ]
    assert rec.calls == per_batch * 4  # 8 buckets / batch_size 2


def test_snapshot_id_plumbed_into_watermarks(spark, recording_run):
    """Each watermark row carries the snapshot id RETURNED BY the data
    commit of its own batch — the lineage link an Iceberg deployment
    gets (read_as_of by snapshot), minted here by the recorder."""
    rec, _, ck = recording_run
    wm = checkpoint.read_watermarks(spark, ck).orderBy("committed_at_ticks")
    rows = wm.collect()
    assert len(rows) == 8
    # 4 data commits -> snap-000001..snap-000004, two buckets each
    snaps = sorted({r["snapshot_id"] for r in rows})
    assert snaps == [f"snap-{i:06d}" for i in range(1, 5)]
    by_snap = {}
    for r in rows:
        by_snap.setdefault(r["snapshot_id"], []).append(r["bucket"])
    assert all(len(bs) == 2 for bs in by_snap.values())
    # monotone: later ticks never carry an earlier snapshot
    ordered = [r["snapshot_id"] for r in rows]
    assert ordered == sorted(ordered)


def test_writer_output_identical_to_default(spark, corpus_dfs, tmp_path, recording_run):
    """The seam must not change WHAT is committed: a run through the
    recording writer and a default (parquet stand-in) run produce
    row-identical output tables; the stand-in's snapshot ids are NULL."""
    _, out_rec, _ = recording_run
    docs_df, cands_df = corpus_dfs
    ck2 = str(tmp_path / "ck_plain")
    out_plain = checkpoint.run(
        spark, docs_df, ck2, "rp", candidates=cands_df,
        n_buckets=8, bucket_batch_size=2,
    )

    def key(df):
        return {
            r["doc_id"]: [tuple(s) for s in (r["spans"] or [])]
            for r in df.collect()
        }

    assert key(out_rec) == key(out_plain)
    wm2 = checkpoint.read_watermarks(spark, ck2)
    assert wm2.where(F.col("snapshot_id").isNotNull()).count() == 0


def test_resume_through_writer_skips_committed(spark, corpus_dfs, tmp_path):
    """Crash after 1 batch, resume with a FRESH recorder: only the
    pending 6 buckets (3 batches) commit — the writer seam sees no
    calls for already-committed buckets."""
    docs_df, cands_df = corpus_dfs
    ck = str(tmp_path / "ck_resume")
    rec1 = RecordingWriter(ParquetDirWriter(ck))
    with pytest.raises(RuntimeError, match="injected failure"):
        checkpoint.run(
            spark, docs_df, ck, "rr", candidates=cands_df,
            n_buckets=8, bucket_batch_size=2, fail_after_batches=1,
            writer=rec1,
        )
    assert len(rec1.calls) == 3  # exactly one committed batch
    rec2 = RecordingWriter(ParquetDirWriter(ck))
    checkpoint.run(
        spark, docs_df, ck, "rr", candidates=cands_df,
        n_buckets=8, bucket_batch_size=2, writer=rec2,
    )
    assert len(rec2.calls) == 9  # 3 remaining batches x 3 calls
    assert checkpoint.completed_buckets(spark, ck, "rr") == set(range(8))


def test_iceberg_writer_names_and_sequence(spark):
    """IcebergTableWriter targets {namespace}.{table} via writeTo;
    sandbox has no iceberg catalog, so pin the naming seam (the part a
    misconfigured deployment gets wrong silently) without executing a
    commit."""
    from ocr_project_spark.plans.writer import IcebergTableWriter

    w = IcebergTableWriter(spark, "lake.extraction")
    assert w._name(checkpoint.OUTPUT_TABLE) == "lake.extraction.extracted"
    assert w._name(checkpoint.WATERMARK_TABLE) == "lake.extraction.watermarks"
    # writeTo against the unconfigured catalog fails loudly (not a
    # silent parquet fallback)
    df = spark.range(1)
    with pytest.raises(Exception):
        w.append(df, checkpoint.WATERMARK_TABLE)
