"""Resumable checkpointed extraction runs with per-bucket watermarks,
lineage and metrics.

North_rule clause: "resumable from checkpoint with per-partition
lineage + metrics".  The reference has no restart story at all — its
batch loop simply re-runs from scratch (/root/reference/src/advanced_ocr/
pipeline.py:111-123).  At 10^12 documents a run WILL be interrupted, so:

* Input is bucketed by ``pmod(hash(doc_id), n_buckets)`` (stable across
  restarts and cluster sizes — partitioning.bucket_expr).
* Buckets are processed in batches; after each batch commits its output
  (parquet dir layout partitioned by bucket — the sandbox stand-in for
  an Iceberg table + metadata table, SURVEY.md section 7.4), one
  watermark row per bucket is appended to the ``watermarks`` table and
  one metrics row per (bucket, stage) to the ``metrics`` table.
* On restart the driver reads the watermark table and processes only
  buckets without a committed watermark — an anti-join at metadata
  scale (n_buckets rows, never corpus scale).

Crash atomicity: output data is written BEFORE the watermark, so a
crash between the two leaves an orphaned-but-uncommitted bucket
directory.  ``run`` therefore overwrites (dynamic partition overwrite)
rather than appends data partitions, making bucket replay idempotent —
re-extraction of a bucket is deterministic, so replay converges to the
same rows.  This mirrors Iceberg's snapshot-commit semantics with the
watermark append as the commit point.

Concurrency contract (tested:
tests/test_plans.py::test_checkpoint_interleaved_commit_converges):

* **Stale double-commits converge.**  A writer that crashed in the
  data->watermark gap may come back and append its watermark AFTER a
  takeover writer already re-committed the bucket.  This is safe by
  construction: data partitions are overwritten (never appended) by a
  deterministic job, and duplicate watermark rows collapse to one
  commit (``completed_buckets`` reads DISTINCT bucket per run_id) —
  the snapshot log tolerates the late commit exactly like Iceberg's
  retry-after-commit-conflict path.
* **One ACTIVE writer per (out_dir, run_id).**  Two writers executing
  the SAME bucket's data overwrite concurrently is the one case the
  plain-parquet stand-in cannot isolate: a reader (including the
  lineage-stats pass) can observe a partially-rewritten partition
  directory mid-overwrite.  A real deployment gets this from Iceberg's
  atomic snapshot swap; here the constraint is on the operator —
  coordinate takeovers so the previous writer is dead before the next
  starts (the crash/resume path above, not a live-live race).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_project_spark import schema
from ocr_project_spark.operators.extract import extract, extract_chunked
from ocr_project_spark.plans.partitioning import with_bucket

WATERMARK_TABLE = "watermarks"
METRICS_TABLE = "metrics"
OUTPUT_TABLE = "extracted"


def _path(root: str, name: str) -> str:
    return f"{root}/{name}"


def completed_buckets(spark: SparkSession, ckpt_dir: str, run_id: str) -> set[int]:
    """Buckets with a committed watermark for this run_id."""
    try:
        wm = spark.read.schema(schema.WATERMARKS).parquet(
            _path(ckpt_dir, WATERMARK_TABLE)
        )
    except Exception:
        return set()
    rows = (
        wm.where((F.col("run_id") == run_id) & (F.col("status") == "committed"))
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r["bucket"] for r in rows}


def _append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def _check_run_config(
    out_dir: str,
    run_id: str,
    n_buckets: int,
    semantics: dict | None = None,
) -> None:
    """Pin the run's bucketing AND output semantics in a meta file.  A
    resume with a different n_buckets would silently mis-map committed
    watermarks onto other documents (bucket = pmod(hash(doc_id), n)
    changes with n); a resume that flips any semantic switch (retry
    pass/threshold, normalize tier, upstream language filter) would mix
    semantics across buckets of one output table.  Both must fail
    loudly instead.

    The stored pin is compared key-by-key over ITS OWN keys, so runs
    started by an older build (fewer pinned switches) still resume
    under a newer one — new switches are only enforced for runs that
    recorded them.  One addition to that rule: a switch that is
    ACTIVE now (truthy pin value) but absent from the stored pin also
    refuses — the old run demonstrably ran without the feature, so
    resuming with it on would mix semantics exactly like recorded
    drift would (e.g. --sample-rate against a pre-sampling manifest).

    Local-filesystem JSON here; a real deployment stores this in the
    Iceberg table properties / snapshot summary.
    """
    import json
    import os

    from ocr_project_spark.errors import CheckpointConflictError

    fusion = dict(semantics or {})
    meta_dir = os.path.join(out_dir, "_run_meta")
    meta_path = os.path.join(meta_dir, f"{run_id}.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("n_buckets") != n_buckets:
            raise CheckpointConflictError(
                f"run {run_id!r} at {out_dir!r} was started with "
                f"n_buckets={meta.get('n_buckets')}; resuming with "
                f"n_buckets={n_buckets} would remap committed buckets "
                "onto different documents"
            )
        # runs started before the fusion key existed carry no pin
        stored = meta.get("fusion")
        if stored is not None:
            drift = {
                k: (stored[k], fusion.get(k))
                for k in stored
                if stored[k] != fusion.get(k)
            }
            # a feature active NOW but never recorded by the stored run
            # is drift too: the committed buckets ran without it
            drift.update(
                {k: (None, v) for k, v in fusion.items() if k not in stored and v}
            )
            if drift:
                raise CheckpointConflictError(
                    f"run {run_id!r} at {out_dir!r} was started with fusion "
                    f"config {stored}; resuming with {fusion} would mix "
                    f"semantics across committed buckets (drift: {drift})"
                )
        return
    os.makedirs(meta_dir, exist_ok=True)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"run_id": run_id, "n_buckets": n_buckets, "fusion": fusion}, f
        )
    os.replace(tmp, meta_path)


def run(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str,
    candidates: DataFrame | None = None,
    n_buckets: int = 16,
    bucket_batch_size: int = 4,
    fail_after_batches: int | None = None,
    chunk_mega_docs: int | None = None,
    retry_candidates: DataFrame | None = None,
    retry_threshold: float = 0.3,
    normalize: str | None = None,
    scrub_pii: bool = False,
    lang_filter_cfg=None,
    extra_pins: dict | None = None,
    writer=None,
) -> DataFrame:
    """Execute (or resume) a checkpointed extraction run.

    ``writer`` is the table-commit seam (plans/writer.TableWriter):
    default ParquetDirWriter(out_dir) — the sandbox's parquet-dir
    stand-in; pass writer.IcebergTableWriter(spark, "catalog.ns") to
    land the same three tables (data / watermarks / metrics) in
    Iceberg with the commit's snapshot id stamped into each watermark
    row.  The call sequence per batch (data overwrite, THEN watermark
    append, THEN metrics append) is the commit protocol and is pinned
    by tests/test_writer_contract.py.

    ``retry_candidates`` runs media fusion in the two-pass PSM-retry
    form per bucket batch (operators/extract.extract retry args); the
    retry table is bucketed alongside the candidates so each batch's
    second pass reads only its own buckets.  Resume-safe: the retry
    result is a pure function of the batch inputs.

    ``normalize`` runs each batch through the composed pipeline's
    K4-K6 output-cleanup tier (pipeline.run_pipeline).  The tier (and
    'auto' routing) is a per-document function, so per-batch
    normalization equals whole-corpus normalization.

    ``lang_filter_cfg`` (a config mapping with per-engine ``languages``
    lists) applies the language-based candidate filter PER BATCH:
    doc_langs is derived from each batch's (bucket-pruned) documents,
    never from the full corpus — an upstream whole-corpus filter would
    rescan and re-language-ID every document once per bucket batch.
    The EFFECTIVE per-engine language lists are pinned in the run
    manifest (not just an on/off flag), so a resume under a changed
    engines config fails loudly instead of mixing filter semantics
    across buckets.

    ``extra_pins`` adds caller-known semantic switches to the manifest
    pin (e.g. the config-disabled engine set the caller filtered
    candidates by).

    ``fail_after_batches`` is a test hook: raise after N committed
    batches to simulate a mid-run crash (tests/test_plans.py resumes
    and asserts exact convergence).

    Returns the output DataFrame (read back from the committed table).

    Scale note: the driver-side loop is over BUCKET BATCHES (metadata
    scale — n_buckets/batch_size iterations), never over documents.
    Each iteration is one distributed job whose input filter
    ``bucket IN (...)`` prunes file partitions when the input is
    written bucket-partitioned.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if writer is None:
        from ocr_project_spark.plans.writer import ParquetDirWriter

        writer = ParquetDirWriter(out_dir)
    # ALL validity checks before the manifest pin is written: a refused
    # combination must not poison _run_meta for a run that never
    # committed a bucket
    if normalize is not None and retry_candidates is not None:
        raise ValueError("normalize + retry_candidates is not supported yet")
    if normalize is not None and chunk_mega_docs:
        raise ValueError("normalize + chunk_mega_docs is not supported yet")
    if retry_candidates is not None:
        if candidates is None:
            raise ValueError("retry_candidates requires candidates")
        if chunk_mega_docs:
            raise ValueError(
                "retry_candidates + chunk_mega_docs is not supported yet"
            )
    if lang_filter_cfg is not None and candidates is None:
        raise ValueError("lang_filter_cfg requires candidates")

    if lang_filter_cfg is not None:
        from ocr_project_spark.functions.fuse import engine_languages

        # pin the EFFECTIVE lists, canonically sorted — an on/off flag
        # would let a changed engines config slip through a resume
        lang_pin = {
            name: sorted(langs)
            for name, langs in engine_languages(lang_filter_cfg).items()
            if langs is not None
        } or False
    else:
        lang_pin = False
    _check_run_config(
        out_dir,
        run_id,
        n_buckets,
        semantics={
            "has_retry": retry_candidates is not None,
            "retry_threshold": (
                retry_threshold if retry_candidates is not None else None
            ),
            "normalize": normalize,
            # scrub changes every committed span's text: a resume that
            # flips it would mix redacted and raw buckets in one table
            "scrub_pii": scrub_pii,
            "lang_filter": lang_pin,
            **(extra_pins or {}),
        },
    )
    docs_b = with_bucket(docs, n_buckets)
    done = completed_buckets(spark, out_dir, run_id)
    pending = [b for b in range(n_buckets) if b not in done]
    batches = [
        pending[i : i + bucket_batch_size]
        for i in range(0, len(pending), bucket_batch_size)
    ]

    cand_b = None
    if candidates is not None:
        cand_b = with_bucket(candidates, n_buckets, col_name="_cbucket")
    retry_b = None
    if retry_candidates is not None:
        retry_b = with_bucket(retry_candidates, n_buckets, col_name="_rbucket")

    for batch_no, batch in enumerate(batches):
        if fail_after_batches is not None and batch_no >= fail_after_batches:
            raise RuntimeError(f"injected failure before batch {batch_no}")
        t0 = time.monotonic()
        batch_docs = docs_b.where(F.col("bucket").isin(batch))
        batch_cands = (
            cand_b.where(F.col("_cbucket").isin(batch)).drop("_cbucket")
            if cand_b is not None
            else None
        )
        batch_retry = (
            retry_b.where(F.col("_rbucket").isin(batch)).drop("_rbucket")
            if retry_b is not None
            else None
        )
        if lang_filter_cfg is not None and batch_cands is not None:
            # per-batch doc_langs: derived from the bucket-pruned docs,
            # so each batch language-IDs only its own documents (a
            # corpus-wide doc_langs here would rescan everything once
            # per batch); candidates and docs bucket identically on
            # doc_id, so the batch filter sees exactly its docs
            from ocr_project_spark.functions.fuse import (
                doc_langs_from_spans,
                filter_candidates_by_language,
            )

            batch_langs = doc_langs_from_spans(batch_docs.drop("bucket"))
            batch_cands = filter_candidates_by_language(
                batch_cands, batch_langs, lang_filter_cfg
            )
            if batch_retry is not None:
                batch_retry = filter_candidates_by_language(
                    batch_retry, batch_langs, lang_filter_cfg
                )
        if chunk_mega_docs:
            out = extract_chunked(
                batch_docs.drop("bucket"), batch_cands,
                max_spans_per_chunk=chunk_mega_docs,
            )
        elif normalize is not None:
            from ocr_project_spark.pipeline import run_pipeline

            out = run_pipeline(
                batch_docs.drop("bucket"), batch_cands, normalize=normalize
            )
        else:
            out = extract(
                batch_docs.drop("bucket"),
                batch_cands,
                retry_candidates=batch_retry,
                retry_threshold=retry_threshold,
            )
        if scrub_pii:
            # pure per-document post-transform: composes with every
            # branch above and with resume (batch output is still a
            # function of the batch inputs + pinned switches)
            from ocr_project_spark.pipeline import scrub_spans

            out = out.withColumn("spans", scrub_spans(F.col("spans")))
        out = with_bucket(out, n_buckets)

        # Per-bucket lineage/metrics in the same pass as the write: one
        # aggregate over the (small) committed batch output.
        snapshot_id = writer.overwrite_partitions(out, OUTPUT_TABLE, "bucket")
        stats = {
            r["bucket"]: (r["docs"], r["spans"], r["errors"])
            for r in writer.read(spark, OUTPUT_TABLE)
            .where(F.col("bucket").isin(batch))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum(F.size(F.coalesce(F.col("spans"), F.array())))
                .cast("long")
                .alias("spans"),
                # never-fail contract: invalid docs are status rows in
                # the output, counted into the lineage metrics table
                F.sum(F.when(~F.col("status.ok"), 1).otherwise(0))
                .cast("long")
                .alias("errors"),
            )
            .collect()
        }
        elapsed_ms = int((time.monotonic() - t0) * 1000)
        ticks = time.time_ns()
        wm_rows = [
            (
                run_id,
                int(b),
                "committed",
                int(stats.get(b, (0, 0, 0))[0]),
                ticks,
                snapshot_id,
            )
            for b in batch
        ]
        met_rows = [
            (
                run_id,
                int(b),
                "extract",
                int(stats.get(b, (0, 0, 0))[0]),
                int(stats.get(b, (0, 0, 0))[2]),
                elapsed_ms,
            )
            for b in batch
        ]
        writer.append(
            spark.createDataFrame(wm_rows, schema.WATERMARKS), WATERMARK_TABLE
        )
        writer.append(
            spark.createDataFrame(met_rows, schema.METRICS), METRICS_TABLE
        )

    return writer.read(spark, OUTPUT_TABLE).drop("bucket")


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(schema.METRICS).parquet(_path(out_dir, METRICS_TABLE))


def read_watermarks(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(schema.WATERMARKS).parquet(
        _path(out_dir, WATERMARK_TABLE)
    )


def read_as_of(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    as_of_ticks: int | None = None,
) -> DataFrame:
    """Snapshot read: only buckets whose watermark committed at or
    before ``as_of_ticks`` (None = latest).  The watermark table acts
    as the snapshot log — the sandbox analog of Iceberg time travel
    (`VERSION AS OF`): a reader pinned to a tick set sees a consistent
    prefix of the run regardless of concurrent later commits.

    Metadata-scale operation: the filter list is n_buckets long and
    prunes bucket=... partition directories at scan planning.
    """
    wm = read_watermarks(spark, out_dir).where(
        (F.col("run_id") == run_id) & (F.col("status") == "committed")
    )
    if as_of_ticks is not None:
        wm = wm.where(F.col("committed_at_ticks") <= as_of_ticks)
    buckets = [r["bucket"] for r in wm.select("bucket").distinct().collect()]
    out = spark.read.parquet(_path(out_dir, OUTPUT_TABLE))
    return out.where(F.col("bucket").isin(buckets)).drop("bucket")
