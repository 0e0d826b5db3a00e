"""Alternative ingest formats for the documents table — the S1 source
breadth beyond parquet (reference utils/images.py:29-43 ``load_image``
dispatches on input form the same way; SURVEY.md section 2.1 maps S1 to
``spark.read`` with pinned schemas).

Every reader takes an EXPLICIT schema (schema.py) — never inferSchema:
at 10^12 documents a schema-inference pass is a full extra scan, and a
drifting inferred type silently corrupts downstream plans.  Malformed
records surface through the same never-fail philosophy as the
extraction status contract: JSONL keeps them as `_corrupt_record`
rows (PERMISSIVE mode) so ingest can count and quarantine instead of
dying, mirroring extract()'s error-status rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import StringType, StructField, StructType

from ocr_project_spark import schema as SCH

CORRUPT_COL = "_corrupt_record"

# DOCUMENTS_SPANS plus the PERMISSIVE-mode quarantine column.  Built
# as a fresh StructType — StructType.add MUTATES the receiver, which
# would silently grow the shared DOCUMENTS_SPANS contract.
_JSONL_SCHEMA = StructType(
    list(SCH.DOCUMENTS_SPANS.fields)
    + [StructField(CORRUPT_COL, StringType(), True)]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, keep_corrupt: bool = False
) -> DataFrame:
    """Read interleaved documents from JSONL:
    ``{"doc_id": ..., "spans": [{kind, text, media_ref, offset}, ...]}``
    one object per line.

    ``keep_corrupt=True`` reads PERMISSIVE with an explicit quarantine
    column: syntactically broken lines become rows whose
    ``_corrupt_record`` holds the raw line (and whose doc_id/spans are
    null — the extraction status contract then tags them null_doc_id
    downstream).  ``keep_corrupt=False`` (default) reads DROPMALFORMED
    against the exact DOCUMENTS_SPANS schema — the parser itself skips
    broken lines, which matters because a PERMISSIVE-then-filter shape
    breaks under aggressive column pruning (a downstream ``count()``
    prunes every real column and Spark refuses a scan that references
    only the internal corrupt column).
    """
    if keep_corrupt:
        return (
            spark.read.schema(_JSONL_SCHEMA)
            .option("mode", "PERMISSIVE")
            # pin the quarantine column name: a deployment that sets
            # spark.sql.columnNameOfCorruptRecord would otherwise
            # silently write corrupt payloads to a column absent from
            # the schema
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return (
        spark.read.schema(SCH.DOCUMENTS_SPANS)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """DOCUMENTS_SPANS -> JSONL (one object per line, gzip-friendly)."""
    docs.write.mode("overwrite").json(path)


# Flat-text documents (the driver's ``documents`` table shape): CSV
# carries no nesting, so the flat form is the natural CSV contract.
FLAT_DOCUMENTS = "doc_id LONG, url STRING, lang STRING, text STRING, n_chars INT"


def read_documents_csv(
    spark: SparkSession, path: str, schema: str = FLAT_DOCUMENTS
) -> DataFrame:
    """Flat documents from headered CSV with a pinned schema.  Quoted
    multiline text fields are enabled: real corpus text contains
    newlines and the default line-splitting reader silently shreds
    such rows into garbage columns."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Interleaved documents from ORC with the pinned DOCUMENTS_SPANS
    schema.  ORC is a first-class columnar alternative to parquet in
    warehouse migrations (same nested-struct support, predicate
    pushdown, and column pruning through the native reader) — the
    schema pin keeps a drifted file from silently widening types."""
    return spark.read.schema(SCH.DOCUMENTS_SPANS).orc(path)


def write_documents_orc(docs: DataFrame, path: str) -> None:
    """DOCUMENTS_SPANS -> ORC (zlib default; columnar, splittable)."""
    docs.write.mode("overwrite").orc(path)


def read_documents_avro(spark: SparkSession, path: str) -> DataFrame:
    """Interleaved documents from Avro (row-oriented — the common
    Kafka-archive landing format).  The spark-avro module is an
    external jar not shipped in this sandbox, so availability is
    probed per-call and absence raises a clear error instead of
    Spark's generic failed-to-find-data-source."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:
        # only translate the missing-module failure: a path or parse
        # error with the jar installed must surface as itself
        msg = str(e)
        if "Failed to find data source" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            raise NotImplementedError(
                "spark-avro module not on the classpath; submit with "
                "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
            ) from e
        raise


def read_media_binaries(
    spark: SparkSession, path: str, glob: str = "*", limit: int | None = None
) -> DataFrame:
    """Raw media payloads via the binaryFile source ->
    ``(media_ref, payload binary, length, mod_time)`` — the ingest
    side of operators/media.py's opaque-binary-column contract
    (payloads stay executor-side; only pruned metadata columns reach
    any shuffle).

    ``glob`` maps to pathGlobFilter (partition-pruned file listing);
    ``limit`` is the S4 MAX_IMAGES cap
    (examples/batch_processing.py:31-33) as a plan-level LIMIT.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("media_ref"),
            F.col("content").alias("payload"),
            F.col("length").alias("length"),
            F.col("modificationTime").alias("mod_time"),
        )
    )
    return df.limit(limit) if limit is not None else df
