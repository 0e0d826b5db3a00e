"""Stateful streaming operators: cross-batch dedup + custom state.

Two tiers, per the Spark-first rule (built-in state before custom):

* ``dedup_stream`` — exactly-once doc_id dedup across microbatches via
  the built-in streaming ``dropDuplicates`` state store.  With a
  watermark the state is bounded (ids older than the horizon are
  evicted); without one it grows forever — at 10^12 docs ALWAYS pass
  ``watermark=`` + an event-time column.  This is the ingest guard for
  the extraction pipeline: re-delivered documents (at-least-once
  sources) extract once.

* ``running_user_totals`` — custom per-key state with
  ``applyInPandasWithState``: running event count + value sum per user,
  updated each microbatch, state persisted in the checkpoint.  The
  pandas group signature mirrors the reference's per-engine lifetime
  stats (total_processed/total_time running counters at
  /root/reference/src/advanced_ocr/core/base_engine.py:36-41,114-132)
  — mutable accumulators turned into explicit, fault-tolerant state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-writer-wins dedup on a streaming DataFrame."""
    keys = key_cols or ["doc_id"]
    if ts_col is not None:
        stream = stream.withColumn(ts_col, stream[ts_col].cast("timestamp"))
        return stream.withWatermark(ts_col, watermark).dropDuplicates(
            keys + [ts_col]
        )
    return stream.dropDuplicates(keys)


RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals with explicit keyed state (survives
    restarts via the stream checkpoint)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
