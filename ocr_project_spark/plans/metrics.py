"""Per-stage / per-partition observability for extraction runs.

North_rule clause: "per-partition lineage + metrics".  The reference
keeps mutable per-engine counters (total_processed, errors, total_time
— /root/reference/src/advanced_ocr/core/base_engine.py:36-41,114-132);
the distributed analogs are:

* ``observed``         — pyspark Observation metrics piggybacked on the
                         action that already runs (no extra job): docs,
                         spans, empty-docs, error rows.
* ``partition_stats``  — one aggregate row per *physical partition*
                         (spark_partition_id), the direct evidence for
                         the skew/salting policy: max/min docs and
                         spans per task.
* accumulator-style error counting happens structurally instead: UDF
  stages never throw (engine_manager.py:132-142's empty-result-on-error
  contract) — they emit ``status`` columns that these aggregates count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "stage") -> tuple[DataFrame, Observation]:
    """Attach an Observation computing doc/span/empty counts during the
    next action on ``df``.  Usage::

        out, obs = observed(extracted)
        out.write.parquet(...)
        obs.get  # {'docs': ..., 'spans': ..., 'empty_docs': ...}
    """
    obs = Observation(name)
    spans_sz = F.size(F.coalesce(F.col("spans"), F.array()))
    aggs = [
        F.count(F.lit(1)).alias("docs"),
        F.sum(spans_sz).alias("spans"),
        F.sum(F.when(spans_sz == 0, 1).otherwise(0)).alias("empty_docs"),
    ]
    if "status" in df.columns:
        # never-fail contract: invalid docs surface as status rows, and
        # the run's metrics count them (reference's per-engine error
        # counters, base_engine.py:114-132)
        aggs.append(
            F.sum(F.when(~F.col("status.ok"), 1).otherwise(0)).alias("error_docs")
        )
    return df.observe(obs, *aggs), obs


def partition_stats(df: DataFrame) -> DataFrame:
    """(partition_id, docs, spans) — one row per physical partition.

    Pure JVM aggregation (spark_partition_id + hash agg), no Python
    crossing; at scale this is the per-task balance report that
    validates the salting policy in plans/partitioning.py.
    """
    spans_sz = F.size(F.coalesce(F.col("spans"), F.array()))
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(spans_sz).cast("long").alias("spans"),
        )
        .orderBy("partition_id")
    )


def skew_report(df: DataFrame) -> dict:
    """Driver-side summary of partition balance: dict with n_partitions,
    max/mean docs per partition, and the max/mean ratio (skew factor).
    """
    rows = partition_stats(df).collect()
    if not rows:
        return {"n_partitions": 0, "max_docs": 0, "mean_docs": 0.0, "skew": 0.0}
    docs = [r["docs"] for r in rows]
    spans = [r["spans"] or 0 for r in rows]
    mean_spans = sum(spans) / len(spans) if spans else 0.0
    return {
        "n_partitions": len(rows),
        "max_docs": max(docs),
        "mean_docs": sum(docs) / len(docs),
        "max_spans": max(spans),
        "mean_spans": mean_spans,
        "skew": (max(spans) / mean_spans) if mean_spans else 0.0,
    }
