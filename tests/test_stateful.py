"""Stateful streaming: cross-batch dedup and applyInPandasWithState
running totals (streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_project_spark.streaming.stateful import dedup_stream, running_user_totals


def _drain(q):
    q.awaitTermination()


def test_stream_dedup_across_batches(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_total = ev.count()
    half = ev.where(F.col("event_id") % 2 == 0)
    n_half = half.count()
    in_dir = str(tmp_path / "in")
    # batch 1: even event_ids; batch 2 (second file): ALL events — the
    # even half is re-delivered and must NOT reappear downstream
    half.coalesce(1).write.mode("append").parquet(in_dir)

    out_rows = []

    def run_drain():
        stream = spark.readStream.schema(ev.schema).parquet(in_dir)
        dd = dedup_stream(stream, key_cols=["event_id"])
        q = (
            dd.writeStream.outputMode("append")
            .foreachBatch(lambda bdf, bid: out_rows.extend(
                r["event_id"] for r in bdf.select("event_id").collect()
            ))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)

    run_drain()
    n1 = len(out_rows)
    assert n1 == n_half
    ev.coalesce(1).write.mode("append").parquet(in_dir)
    run_drain()
    assert len(out_rows) == n_total             # only the odd half added
    assert len(set(out_rows)) == len(out_rows)  # no duplicates ever emitted


def test_running_user_totals_state(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    first = ev.where(F.col("event_id") % 2 == 0)
    in_dir = str(tmp_path / "ev")
    first.coalesce(1).write.mode("append").parquet(in_dir)

    latest: dict = {}

    def run_drain():
        stream = spark.readStream.schema(ev.schema).parquet(in_dir)
        q = (
            running_user_totals(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda bdf, bid: latest.update(
                {r["user_id"]: (r["n_events"], r["total_value"]) for r in bdf.collect()}
            ))
            .option("checkpointLocation", str(tmp_path / "sck"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)

    run_drain()
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(in_dir)
    run_drain()  # state restored from checkpoint, totals continue

    expected = {
        r["user_id"]: (r["n"], r["tv"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tv"))
        .collect()
    }
    got = {u: (n, round(t, 4)) for u, (n, t) in latest.items()}
    assert got == expected
