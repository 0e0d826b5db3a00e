"""Explicit StructType schemas — never inferSchema.

The reference declares every type as a fixed dataclass
(/root/reference/src/advanced_ocr/types.py); we pin the equivalent Spark
schemas here.  Input schema is the BASELINE.json ``input_hint`` contract.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Input span element: one interleaved unit of a document.
# Analog of TextRegion (/root/reference/src/advanced_ocr/types.py:139-166):
# kind <-> text_type, offset <-> reading_order/bbox, media_ref <-> image ref.
# kind/offset are nullable at the schema level: malformed spans are
# detected by the never-fail status contract (doc_status_expr), not
# rejected by schema enforcement at ingest.
SPAN = StructType(
    [
        StructField("kind", StringType(), True),        # "text" | "media"
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),   # "" for text spans
        StructField("offset", IntegerType(), True),     # document order
    ]
)

# Authoritative input table (BASELINE.json input_hint).  doc_id is
# nullable: invalid rows are handled by the never-fail status contract
# (operators/extract.doc_status_expr), not schema enforcement.
DOCUMENTS_SPANS = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("spans", ArrayType(SPAN), True),
    ]
)

# Output span element: boilerplate removed, media resolved, dense order.
# Analog of the fused OCRResult region list (types.py:210-255).
OUT_SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("order", IntegerType(), False),
    ]
)

# Per-doc never-fail status (reference pipeline.py:286-309: per-item
# errors become error results, a batch never dies).
STATUS = StructType(
    [
        StructField("ok", BooleanType(), False),
        StructField("reason", StringType(), True),
    ]
)

EXTRACTED = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("spans", ArrayType(OUT_SPAN), True),
        StructField("status", STATUS, False),
    ]
)

# Per-engine candidate recognitions for media spans.  Analog of the
# per-engine OCRResult dict keyed by engine name
# (/root/reference/src/advanced_ocr/core/engine_manager.py:144-165).
MEDIA_CANDIDATES = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("engine", StringType(), False),
        StructField("text", StringType(), True),
        StructField("confidence", DoubleType(), False),
    ]
)

# Fused winner per media span.  Analog of the combined OCRResult
# (engine_manager.py:294-310).
FUSED = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("text", StringType(), True),
        StructField("confidence", DoubleType(), False),
        StructField("method", StringType(), False),
        StructField("n_consensus", IntegerType(), False),
    ]
)

# Checkpoint / lineage tables (FIXTURES.md section 4).
# snapshot_id: the data-table snapshot the bucket's commit rode in on
# (plans/writer.py) — NULL for the parquet-dir stand-in, the Iceberg
# snapshot id in a real deployment; nullable so pre-existing watermark
# tables read back with NULLs.
WATERMARKS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("docs_done", LongType(), False),
        StructField("committed_at_ticks", LongType(), False),
        StructField("snapshot_id", StringType(), True),
    ]
)

METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("stage", StringType(), False),
        StructField("docs", LongType(), False),
        StructField("errors", LongType(), False),
        StructField("elapsed_ms", LongType(), False),
    ]
)
