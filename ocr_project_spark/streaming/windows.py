"""Event-time windowed aggregation with watermarks — the streaming
analog of the batch gap-and-island sessionizer
(operators/sessionize.py, itself the analog of the reference's y-gap
line grouping, /root/reference/src/advanced_ocr/engines/
paddleocr.py:296-332).

Spark-first: ``session_window`` / ``window`` are Catalyst-native
stateful operators — no custom state store code, watermark handling and
late-data drop come built in.  The same expressions evaluate in batch
mode (used by the tests as the oracle: run the identical plan over the
static table and compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_counts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session windows (gap-based) with event/value totals.

    ``watermark`` (e.g. "30 minutes") bounds state for true streams;
    None runs the identical plan in batch mode.
    """
    # Parquet NTZ timestamps: event-time semantics need TIMESTAMP; the
    # session timezone is pinned to UTC (session.py) so the cast is
    # value-preserving.
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def hourly_counts(
    events: DataFrame,
    watermark: str | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling 1-hour windows per event type (streaming form of
    harness.q_hourly_rollup)."""
    # Parquet NTZ timestamps: event-time semantics need TIMESTAMP; the
    # session timezone is pinned to UTC (session.py) so the cast is
    # value-preserving.
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), "1 hour").alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            type_col,
            "n_events",
            "total_value",
        )
    )
