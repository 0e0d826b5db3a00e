"""SparkSession factory with the engine's standard configuration.

The reference initializes its engines once per process
(/root/reference/src/advanced_ocr/pipeline.py:50-61); our analog is a
single SparkSession configured for Arrow-vectorized Python crossings,
AQE (runtime re-planning, skew-join splitting) and a shuffle width
sized to the machine rather than the default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Only force a master when one was explicitly requested (argument
    # or env).  Under `spark-submit --master spark://...` the submit
    # args already carry the cluster master, and calling .master()
    # here would silently override it back to local[*] — the job would
    # "run" while the cluster sat idle (caught by
    # tools/cluster_submit_bench.sh: both cluster sizes measured
    # identical throughput because neither was actually used).
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None and "PYSPARK_GATEWAY_PORT" not in os.environ:
        # PYSPARK_GATEWAY_PORT marks a spark-submit-owned JVM gateway,
        # whose SparkConf already carries the submitted master
        master = "local[*]"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        # ~2x cores: enough tasks for AQE to coalesce, few enough that
        # small-SF local runs are not dominated by task dispatch.
        shuffle_partitions = max(8, 2 * cpus)

    b = (
        SparkSession.builder.appName(app_name)
        # Arrow batches for every pandas UDF / toPandas crossing.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # AQE: runtime partition coalescing + skew-join splitting — the
        # declarative replacement for the reference's hand-rolled
        # strategy heuristics (SURVEY.md section 4).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Parquet NTZ timestamps must mean the same instant as DuckDB's
        # epoch() for the oracle comparison.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    try:
        spark = b.getOrCreate()
    except Exception as e:
        if master is None and "master" in str(e).lower():
            # A gateway JVM was detected (PYSPARK_GATEWAY_PORT) but its
            # SparkConf carries no master — an unusual embedder or a
            # hand-rolled gateway.  We deliberately do NOT fall back to
            # local[*] here: under spark-submit that silently benches
            # the driver machine while the cluster idles (the round-4
            # deploy bug).  Point at the explicit escape hatch instead.
            raise RuntimeError(
                "no Spark master: the detected gateway JVM carries no "
                "master in its SparkConf; set SPARK_GRAFT_MASTER (or "
                "pass master=) to choose one explicitly"
            ) from e
        raise
    spark.sparkContext.setLogLevel("ERROR")
    return spark
