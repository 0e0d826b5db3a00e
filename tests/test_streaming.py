"""Structured Streaming surface: incremental extraction drains only
new files; windowed aggregations match their batch oracles.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ocr_project_spark import oracle
from ocr_project_spark.sources.generate import generate_corpus
from ocr_project_spark.streaming.pipeline import stream_extract
from ocr_project_spark.streaming.windows import hourly_counts, session_counts

SPAN_T = pa.struct(
    [("kind", pa.string()), ("text", pa.string()),
     ("media_ref", pa.string()), ("offset", pa.int32())]
)


def _write_docs(docs, path):
    tbl = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "spans": pa.array([d["spans"] for d in docs], pa.list_(SPAN_T)),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)


def _cands_df(spark, cands):
    from ocr_project_spark import schema

    return spark.createDataFrame(
        [(c["doc_id"], c["offset"], c["engine"], c["text"], c["confidence"]) for c in cands],
        schema.MEDIA_CANDIDATES,
    )


def test_stream_extract_incremental(spark, tmp_path):
    docs, cands = generate_corpus(n_docs=120, base_seed=42)
    half1, half2 = docs[:60], docs[60:]
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    cands_df = _cands_df(spark, cands)

    _write_docs(half1, f"{in_dir}/part-0001.parquet")
    n1 = stream_extract(spark, in_dir, out_dir, ck_dir, candidates=cands_df)
    assert n1 >= 1
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 60

    # second arrival: only the new file is processed
    _write_docs(half2, f"{in_dir}/part-0002.parquet")
    stream_extract(spark, in_dir, out_dir, ck_dir, candidates=cands_df)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 120
    assert got2.select("doc_id").distinct().count() == 120  # no reprocessing

    # value equality vs the pure-Python oracle
    expected = oracle.extract_corpus(docs, cands)
    actual = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in (r["spans"] or [])
        ]
        for r in got2.collect()
    }
    exp = {
        k: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in v]
        for k, v in expected.items()
    }
    assert actual == exp

    # third drain with nothing new: no growth
    stream_extract(spark, in_dir, out_dir, ck_dir, candidates=cands_df)
    assert spark.read.parquet(out_dir).count() == 120


def test_streaming_windows_match_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "ev")
    ev.write.parquet(in_dir)

    batch_hourly = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_counts(ev).collect()
    }

    stream = (
        spark.readStream.schema(ev.schema).parquet(in_dir)
    )
    agg = hourly_counts(stream, watermark="1 day")
    out_rows = []

    def sink(bdf, bid):
        out_rows.extend(bdf.collect())

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "wck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"]) for r in out_rows
    }
    assert got == batch_hourly


def test_session_window_batch_sanity(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = session_counts(ev, gap="10 minutes")
    row = s.agg(F.sum("n_events").alias("n")).collect()[0]
    assert row["n"] == ev.count()  # every event lands in exactly one session
    # session windows never overlap per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    lagged = s.withColumn("prev_end", F.lag("session_end").over(w))
    bad = lagged.where(
        F.col("prev_end").isNotNull() & (F.col("session_start") < F.col("prev_end"))
    )
    assert bad.count() == 0


def test_stream_extract_emits_status_rows(spark, tmp_path):
    """The never-fail contract holds through the streaming path: a
    malformed document in a microbatch becomes a status row in the
    sink, and the batch still commits."""
    docs, cands = generate_corpus(n_docs=30, base_seed=42)
    bad = [
        dict(doc_id="bad_null_spans", spans=None),
        dict(doc_id="bad_span", spans=[dict(kind=None, text="x y z",
                                            media_ref=None, offset=0)]),
    ]
    in_dir = str(tmp_path / "in_s")
    out_dir = str(tmp_path / "out_s")
    ck_dir = str(tmp_path / "ck_s")
    _write_docs(docs + bad, f"{in_dir}/part-0001.parquet")
    stream_extract(spark, in_dir, out_dir, ck_dir,
                   candidates=_cands_df(spark, cands))
    got = spark.read.parquet(out_dir)
    status = {
        r["doc_id"]: (r["status"]["ok"], r["status"]["reason"],
                      len(r["spans"] or []))
        for r in got.collect()
    }
    assert len(status) == 32
    assert status["bad_null_spans"] == (False, "null_spans", 0)
    assert status["bad_span"] == (False, "malformed_span", 0)
    assert all(ok for d, (ok, _, _) in status.items() if not d.startswith("bad"))


def test_stream_extract_retry_matches_batch(spark, tmp_path):
    """Retry fusion through the streaming path: two file arrivals with
    retry_candidates produce exactly the batch
    extract(retry_candidates=...) output — micro-batching never changes
    how a document fuses."""
    from ocr_project_spark.operators.extract import extract

    docs, cands = generate_corpus(n_docs=80, base_seed=42)
    in_dir = str(tmp_path / "in_r")
    out_dir = str(tmp_path / "out_r")
    ck_dir = str(tmp_path / "ck_r")
    cands_df = _cands_df(spark, cands)
    retry_df = cands_df.groupBy("doc_id", "offset").agg(
        F.lit("rec_retry").alias("engine"),
        F.concat(F.lit("retry:"), F.min("text")).alias("text"),
        F.lit(0.93).alias("confidence"),
    ).select("doc_id", "offset", "engine", "text", "confidence")

    _write_docs(docs[:40], f"{in_dir}/part-0001.parquet")
    stream_extract(spark, in_dir, out_dir, ck_dir, candidates=cands_df,
                   retry_candidates=retry_df, retry_threshold=0.6)
    _write_docs(docs[40:], f"{in_dir}/part-0002.parquet")
    stream_extract(spark, in_dir, out_dir, ck_dir, candidates=cands_df,
                   retry_candidates=retry_df, retry_threshold=0.6)

    def key(df):
        return {
            r["doc_id"]: [tuple(s) for s in (r["spans"] or [])]
            for r in df.collect()
        }

    docs_df = spark.createDataFrame(
        [(d["doc_id"], d["spans"]) for d in docs],
        spark.read.parquet(in_dir).schema,
    )
    want = key(extract(docs_df, cands_df, retry_candidates=retry_df,
                       retry_threshold=0.6))
    got = key(spark.read.parquet(out_dir))
    assert got == want
    # the retry pass actually fired somewhere in the streamed output
    assert any(
        s[1] is not None and s[1].startswith("retry:")
        for spans in got.values() for s in spans
    )


def test_stream_extract_retry_requires_candidates(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="requires candidates"):
        stream_extract(
            spark, str(tmp_path / "x"), str(tmp_path / "y"),
            str(tmp_path / "z"),
            retry_candidates=spark.createDataFrame(
                [], "doc_id string, offset int, engine string, text string, "
                    "confidence double"),
        )
