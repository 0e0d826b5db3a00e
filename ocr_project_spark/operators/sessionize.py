"""Gap-and-island sessionization — the distributed form of the
reference's line-grouping walk (W3, /root/reference/src/advanced_ocr/
engines/paddleocr.py:296-332: start a new line when the y-gap exceeds a
threshold).

One shuffle on the partition key; the island id is a running sum of
gap flags over an ordered window — the textbook Spark translation of a
sequential scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    gap: Column,
    threshold: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign island ids: new session when gap to previous row > threshold.

    ``gap`` is an expression over (current, lag) — callers pass e.g.
    ``F.col(order_col).cast("long") - F.lag(order_col).cast("long")``
    pre-built via the helper below, or we compute a numeric delta here.
    """
    w = Window.partitionBy(partition_col).orderBy(order_col)
    delta = gap
    flag = F.when(delta.isNull() | (delta <= F.lit(threshold)), 0).otherwise(1)
    return df.withColumn(
        session_col,
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def epoch_seconds(c: Column) -> Column:
    """Fractional epoch seconds from TIMESTAMP or TIMESTAMP_NTZ (the
    NTZ value is interpreted in the session zone — UTC per session.py —
    matching DuckDB's epoch())."""
    return c.cast("timestamp").cast("double")


# W4 prev-gap classification boundaries (seconds).  Single-sourced here
# because the ladder appears in two driver queries AND their SQL
# oracles — a threshold tweak must move all four together.
TIGHT_GAP_S = 60
NORMAL_GAP_S = 600


def gap_class(
    gap: Column, tight: float = TIGHT_GAP_S, normal: float = NORMAL_GAP_S
) -> Column:
    """W4 gap ladder over a lag delta: NULL (first row of the
    partition) -> 'first', <=tight -> 'tight', <=normal -> 'normal',
    else 'wide'.  Reference analog: the spacing classifier in
    /root/reference/src/advanced_ocr/engines/paddleocr.py:296-332."""
    return (
        F.when(gap.isNull(), "first")
        .when(gap <= F.lit(tight), "tight")
        .when(gap <= F.lit(normal), "normal")
        .otherwise("wide")
    )


def sessionize_by_time(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    w = Window.partitionBy(partition_col).orderBy(ts_col)
    sec = epoch_seconds(F.col(ts_col))
    delta = sec - F.lag(sec).over(w)
    return sessionize(df, partition_col, ts_col, delta, gap_seconds, session_col)
