"""As-of and interval (range) joins — operators Spark lacks natively,
composed from existing DataFrame primitives (the task-mandated tier (a)
strategy: composition before pandas UDFs).

``asof_join`` — for each left row, the most recent right row with
``right.ts <= left.ts`` per key.  NOT implemented as a theta join
(``r.ts <= l.ts`` + window = O(n^2) candidates); instead the classic
scalable union-and-fill:

    union both sides tagged -> window last_value(right cols) over
    (key ORDER BY ts, side) ignoring nulls -> keep left rows

One hash-partition shuffle on key, linear work per partition — the
same shape Flink's temporal join and kdb's aj use.  Right-side rows
tag 0 so a right row at exactly left.ts is visible (<= semantics,
matching DuckDB's ASOF JOIN oracle).

Without ``by`` there is no hash key, and a naive global window
(``partitionBy(lit(1))``) would serialize the whole input through one
reducer — an API-level scale-killer.  Instead the keyless path
range-partitions the union on the time column, runs the same
fill-forward window *per range partition* in parallel, and stitches
partitions with a boundary-carry: a numPartitions-row table of each
partition's last-seen right values, prefix-filled (tiny, single-task
by construction) and broadcast back.  Each right column fills
independently from its own latest non-null occurrence — identical
semantics to the keyed path's per-column ``last(ignorenulls=True)``.

``interval_join`` — left rows matched to ranges [start, end) they fall
into.  A raw range predicate would be a broadcast-nested-loop; instead
both sides explode to fixed-width time buckets and equi-join on
(key?, bucket), then the exact range predicate filters bucket-collision
false positives.  Candidate count is bounded by range_len/bucket per
range — the standard scale trick for interval joins (and what AQE
cannot do for you: the join SHAPE must be an equi-join to shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: latest right row with right.on <= left.on
    (per ``by`` key if given).  Returns all left columns plus
    ``<right_col><suffix>`` for each requested right column (null when
    no prior right row exists)."""
    rcols = right_cols or [c for c in right.columns if c not in {on, by}]
    keys = [by] if by else []

    l_tag = left.withColumn("_side", F.lit(1))
    for c in rcols:
        l_tag = l_tag.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        *keys, on, *[F.col(c).alias(f"{c}{suffix}") for c in rcols]
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in set(keys + [on]):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tag.unionByName(r_tag)
    if not keys:
        return _asof_global(unioned, left, on, rcols, suffix)
    w = (
        Window.partitionBy(*keys)
        .orderBy(on, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        "_side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side")


def _asof_global(
    unioned: DataFrame, left: DataFrame, on: str, rcols: list[str], suffix: str
) -> DataFrame:
    """Keyless as-of: range-partition on the time column, fill forward
    per partition in parallel, carry the boundary right-values across
    partitions via a tiny broadcast table.

    ``repartitionByRange(on, _side)`` keeps equal timestamps together
    (and right rows sorting before same-timestamp left rows), so the
    only cross-partition dependency is "the last right value seen in
    any earlier partition" — exactly what the carry table provides.
    The single-task window runs over ≤ numPartitions rows, never data.
    """
    scols = [f"{c}{suffix}" for c in rcols]
    part = (
        unioned.repartitionByRange(F.col(on), F.col("_side"))
        .sortWithinPartitions(on, "_side")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )

    # Per-partition boundary: for each right column independently, its
    # value at that column's latest non-null right row in the partition
    # (matches the keyed path's per-column last(ignorenulls) semantics).
    bnd = (
        part.where(F.col("_side") == 0)
        .groupBy("_pid")
        .agg(
            *[
                F.max_by(
                    F.col(c), F.when(F.col(c).isNotNull(), F.col(on))
                ).alias(c)
                for c in scols
            ]
        )
    )
    # Prefix-fill: carry[pid] = last non-null boundary among pids < pid.
    # The window is single-task but over ≤ numPartitions rows.
    wb = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        part.select("_pid").distinct()
        .join(bnd, "_pid", "left")
        .select(
            "_pid",
            *[
                F.last(c, ignorenulls=True).over(wb).alias(f"_carry_{c}")
                for c in scols
            ],
        )
    )

    w = (
        Window.partitionBy("_pid")
        .orderBy(on, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = part.select(
        *left.columns,
        "_side",
        "_pid",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in scols],
    )
    return (
        filled.where(F.col("_side") == 1)
        .join(F.broadcast(carry), "_pid")
        .select(
            *left.columns,
            *[F.coalesce(F.col(c), F.col(f"_carry_{c}")).alias(c) for c in scols],
        )
    )


def interval_join(
    left: DataFrame,
    ranges: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Equi-join-shaped interval join: left rows x ranges with
    start <= ts < end.  Ranges explode to the buckets they overlap;
    rows join on their single bucket; the exact predicate filters.

    Bucketing is done on fractional epoch seconds (timestamp cast to
    double), not ``unix_timestamp`` (which truncates sub-second parts
    and silently drops rows whose bucket the truncated end misses).
    ``end`` is exclusive, so the last covered bucket is
    ``ceil(end/bucket) - 1`` — a range ending exactly on a boundary
    does not overlap that bucket, while a fractional overhang does.
    Degenerate ranges (end <= start) cover nothing and are dropped
    before the explode so ``sequence`` can never descend.
    """
    ts_b = F.floor(F.col(ts_col).cast("double") / bucket_seconds).cast("long")
    start_b = F.floor(
        F.col(start_col).cast("double") / bucket_seconds
    ).cast("long")
    end_b = (
        F.ceil(F.col(end_col).cast("double") / bucket_seconds) - 1
    ).cast("long")

    l = left.withColumn("_bucket", ts_b)
    r = ranges.where(
        F.col(start_col).cast("double") < F.col(end_col).cast("double")
    ).withColumn("_bucket", F.explode(F.sequence(start_b, end_b)))
    joined = l.join(r, "_bucket")
    return joined.where(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("_bucket")
