"""PySpark-native interleaved-document extraction engine.

A from-scratch re-expression of the capabilities of the reference
``adarsh7892368289-ai/OCR-Project`` (a single-process detect -> recognize ->
fuse OCR library) as declarative Spark DataFrame stages over tables of
interleaved text+media documents::

    (doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)

Design (see SURVEY.md):
  * DataFrame / Catalyst-first — classification, fusion, assembly are
    built-in column expressions & higher-order functions wherever
    expressible (whole-stage codegen, no Python in the hot path).
  * A vectorized Arrow/pandas-UDF engine path mirrors the reference's
    pluggable recognizer registry for kernels Spark can't express.
  * Explicit hash(doc_id) partitioning + salting for skewed mega-docs,
    AQE on, resumable checkpoints with per-partition watermarks.
"""

__version__ = "0.1.0"

from ocr_project_spark.session import get_spark  # noqa: F401
