"""Bucketed storage layout: the shuffle-free path for the fusion join.

North_rule: "Iceberg tables ... partitioning / shuffle / skew handled
explicitly".  The Iceberg production design buckets BOTH tables by
``bucket(N, doc_id)`` at write time; Spark then plans the candidate
fusion (groupBy doc_id/offset), the per-doc map aggregate (groupBy
doc_id) and the docs<-fused join with ZERO exchanges — every stage is
already hash(doc_id)-distributed by storage.  At 10^12 documents this
removes the only corpus-scale shuffles in the pipeline (measured in
tools/scaling_bench.py: the shuffled variant loses ~2.5x wall time and
most of its scaling efficiency to shuffle I/O).

Sandbox stand-in: Spark bucketed parquet tables (``CLUSTERED BY
(doc_id) INTO n BUCKETS``) declared as EXTERNAL tables over a fixed
location.  Bucket identity lives in the file names, so a fresh session
(or a different JVM — see the cross-session test) re-declares the same
DDL over the same location and inherits the bucketing, exactly like an
Iceberg catalog lookup.  Keep the writer behind these functions so a
real deployment swaps in ``writeTo(...).using("iceberg")`` +
``bucket(N, doc_id)`` partition transform (SURVEY.md section 7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCS_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
  doc_id STRING,
  spans ARRAY<STRUCT<kind: STRING, text: STRING, media_ref: STRING, offset: INT>>
) USING parquet CLUSTERED BY (doc_id) INTO {n} BUCKETS LOCATION '{loc}'
"""

CANDS_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
  doc_id STRING, offset INT, engine STRING, text STRING, confidence DOUBLE
) USING parquet CLUSTERED BY (doc_id) INTO {n} BUCKETS LOCATION '{loc}'
"""

EXTRACTED_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
  doc_id STRING,
  spans ARRAY<STRUCT<kind: STRING, text: STRING, media_ref: STRING, order: INT>>,
  status STRUCT<ok: BOOLEAN, reason: STRING>
) USING parquet CLUSTERED BY (doc_id) INTO {n} BUCKETS LOCATION '{loc}'
"""


def declare_tables(
    spark: SparkSession,
    location_root: str,
    n_buckets: int = 64,
    prefix: str = "ocr",
) -> tuple[str, str]:
    """(Re-)declare the bucketed external tables; returns their names.
    Idempotent per session; safe over pre-existing data directories."""
    docs_name = f"{prefix}_documents_spans"
    cands_name = f"{prefix}_media_candidates"
    spark.sql(DOCS_DDL.format(name=docs_name, n=n_buckets,
                              loc=f"{location_root}/{docs_name}"))
    spark.sql(CANDS_DDL.format(name=cands_name, n=n_buckets,
                               loc=f"{location_root}/{cands_name}"))
    return docs_name, cands_name


def write_bucketed(
    spark: SparkSession,
    docs: DataFrame,
    cands: DataFrame,
    location_root: str,
    n_buckets: int = 64,
    prefix: str = "ocr",
) -> tuple[str, str]:
    """Bucket-partition both tables by doc_id at write time (one
    shuffle each, paid ONCE at ingest instead of on every query)."""
    docs_name, cands_name = declare_tables(spark, location_root, n_buckets, prefix)
    docs.select("doc_id", "spans").write.mode("append").insertInto(docs_name)
    cands.select("doc_id", "offset", "engine", "text", "confidence").write.mode(
        "append"
    ).insertInto(cands_name)
    return docs_name, cands_name


def read_bucketed(
    spark: SparkSession,
    location_root: str,
    n_buckets: int = 64,
    prefix: str = "ocr",
) -> tuple[DataFrame, DataFrame]:
    docs_name, cands_name = declare_tables(spark, location_root, n_buckets, prefix)
    return spark.table(docs_name), spark.table(cands_name)
