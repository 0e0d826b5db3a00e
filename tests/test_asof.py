"""As-of and interval join semantics (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ocr_project_spark.operators.asof import asof_join, interval_join


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01T10:00:00")),
         (2, "u1", ts("2024-01-01T10:05:00")),
         (3, "u1", ts("2024-01-01T09:00:00")),   # before any right row
         (4, "u2", ts("2024-01-01T10:00:00"))],  # other key
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", ts("2024-01-01T09:30:00"), 1.0),
         ("u1", ts("2024-01-01T10:00:00"), 2.0),   # equal ts -> visible (<=)
         ("u1", ts("2024-01-01T10:04:00"), 3.0),
         ("u2", ts("2024-01-01T09:59:00"), 9.0)],
        "user string, ts timestamp, px double",
    )
    out = {
        r["id"]: r["px_r"]
        for r in asof_join(left, right, on="ts", by="user", right_cols=["px"]).collect()
    }
    assert out == {1: 2.0, 2: 3.0, 3: None, 4: 9.0}


def test_asof_no_key(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"))], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(ts("2024-01-01T09:00:00"), 5.0)], "ts timestamp, px double"
    )
    rows = asof_join(left, right, on="ts", right_cols=["px"]).collect()
    assert rows[0]["px_r"] == 5.0


def test_asof_no_key_scalable_plan_and_semantics(spark):
    """The keyless path must NOT serialize the data through one global
    window: the fill-forward window partitions by the range-partition
    id, and results match a brute-force oracle at several partition
    counts (partition boundaries move; the boundary-carry must stitch
    them correctly)."""
    base = ts("2024-01-01T00:00:00")
    lrows = [(i, base + dt.timedelta(seconds=7 * i)) for i in range(200)]
    # right rows every 13 s, px = index; some null px values so the
    # per-column independent fill is exercised across boundaries too
    rrows = [
        (base + dt.timedelta(seconds=13 * j), float(j) if j % 5 else None)
        for j in range(80)
    ]

    def brute(lts):
        best = None
        for rts, px in rrows:
            if rts <= lts and px is not None and (best is None or rts > best[0]):
                best = (rts, px)
        return best[1] if best else None

    expected = {i: brute(lts) for i, lts in lrows}

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for nparts in ("3", "11"):
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            left = spark.createDataFrame(lrows, "id long, ts timestamp")
            right = spark.createDataFrame(rrows, "ts timestamp, px double")
            out = asof_join(left, right, on="ts", right_cols=["px"])
            got = {r["id"]: r["px_r"] for r in out.collect()}
            assert got == expected, f"mismatch at shuffle.partitions={nparts}"
            plan = out._jdf.queryExecution().executedPlan().toString()
            # the data-path window is keyed by the range-partition id,
            # not a constant
            assert "windowspecdefinition(_pid" in plan
            assert "partitionBy(1)" not in plan
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_interval_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00")),    # == start -> in
         (2, ts("2024-01-01T11:59:59")),    # just inside
         (3, ts("2024-01-01T12:00:00")),    # == end (exclusive) -> out
         (4, ts("2024-01-01T09:59:59"))],   # before start -> out
        "id long, ts timestamp",
    )
    ranges = spark.createDataFrame(
        [(ts("2024-01-01T10:00:00"), ts("2024-01-01T12:00:00"), "w1")],
        "wstart timestamp, wend timestamp, name string",
    )
    got = sorted(
        r["id"]
        for r in interval_join(left, ranges, ts_col="ts",
                               start_col="wstart", end_col="wend").collect()
    )
    assert got == [1, 2]


def test_interval_join_plan_is_equi(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:30:00"))], "id long, ts timestamp"
    )
    ranges = spark.createDataFrame(
        [(ts("2024-01-01T10:00:00"), ts("2024-01-01T12:00:00"), "w1")],
        "wstart timestamp, wend timestamp, name string",
    )
    plan = (
        interval_join(left, ranges, ts_col="ts", start_col="wstart", end_col="wend")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_fractional_end_on_bucket_boundary(spark):
    """A range ending a fraction past a bucket boundary must still
    match rows in [boundary, end) — the truncating-unix_timestamp bug:
    end=..:00.5 with hourly buckets dropped the final bucket."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T02:00:00.200")),   # in [02:00, 02:00:00.5)
         (2, ts("2024-01-01T02:00:00.700")),   # past end -> no match
         (3, ts("2024-01-01T01:30:00"))],      # mid-range
        "id long, ts timestamp",
    )
    ranges = spark.createDataFrame(
        [("r1", ts("2024-01-01T01:00:00"), ts("2024-01-01T02:00:00.500"))],
        "name string, start timestamp, end timestamp",
    )
    out = sorted(
        r["id"] for r in interval_join(left, ranges, bucket_seconds=3600).collect()
    )
    assert out == [1, 3]


def test_interval_join_degenerate_ranges_dropped(spark):
    """end <= start covers nothing; it must neither match nor make
    F.sequence explode descending buckets."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T01:00:00"))], "id long, ts timestamp"
    )
    ranges = spark.createDataFrame(
        [("empty", ts("2024-01-01T01:00:00"), ts("2024-01-01T01:00:00")),
         ("inverted", ts("2024-01-01T05:00:00"), ts("2024-01-01T00:00:00")),
         ("good", ts("2024-01-01T00:30:00"), ts("2024-01-01T01:30:00"))],
        "name string, start timestamp, end timestamp",
    )
    rows = interval_join(left, ranges, bucket_seconds=3600).collect()
    assert [(r["id"], r["name"]) for r in rows] == [(1, "good")]
