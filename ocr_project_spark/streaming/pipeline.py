"""Incremental extraction: readStream -> extract -> append sink.

Design notes (scale-first):

* File-source streaming with ``trigger(availableNow=True)`` — drain
  everything new, then stop.  Repeated invocations process only files
  not yet recorded in the stream checkpoint: the idiomatic Spark
  incremental-batch pattern (and the one that works identically on a
  1000-executor cluster).
* The per-microbatch work is EXACTLY the batch plan
  (operators/extract.extract) via ``foreachBatch`` — no second
  implementation to drift.  Candidates are a static DataFrame joined
  per microbatch (stream-static join).
* Exactly-once: the file source tracks consumed files in the
  checkpoint; the parquet sink append is idempotent per microbatch id
  in normal operation.  For hard end-to-end exactly-once at scale the
  sink would be an Iceberg table write (same as plans/checkpoint.py);
  the parquet dir is the sandbox stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocr_project_spark import schema
from ocr_project_spark.operators.extract import extract


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    candidates: DataFrame | None = None,
    max_files_per_trigger: int | None = None,
    retry_candidates: DataFrame | None = None,
    retry_threshold: float = 0.3,
) -> int:
    """Drain all unprocessed document files from ``input_dir`` through
    the extraction pipeline into ``output_dir``.  Returns the number of
    microbatches executed.  Safe to call repeatedly; each call picks up
    only newly-arrived files.

    ``retry_candidates`` runs media fusion in the two-pass PSM-retry
    form (functions/fuse.fuse_with_retry) inside each microbatch.
    Micro-batching does not change the result: fusion and the retry
    gate are per-(doc_id, offset) over STATIC candidate tables, and a
    document's spans arrive in one row, so batch membership only
    selects WHICH docs are processed, never how a doc fuses — stream
    output equals the batch pipeline doc-for-doc (pinned by
    tests/test_streaming.py).
    """
    if retry_candidates is not None and candidates is None:
        # extract() only consults retry_candidates when fusing; without
        # candidates the retry table would be silently ignored
        raise ValueError("retry_candidates requires candidates")
    reader = (
        spark.readStream.schema(schema.DOCUMENTS_SPANS)
        .option("latestFirst", "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)

    n_batches = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract(
            batch_df,
            candidates,
            retry_candidates=retry_candidates,
            retry_threshold=retry_threshold,
        )
        out.write.mode("append").parquet(output_dir)
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]
