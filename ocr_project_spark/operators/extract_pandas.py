"""The extraction pipeline's Arrow/pandas-UDF engine path.

Same semantics as operators/extract.py (the built-in-HOF fast path),
but the per-document assembly runs as a vectorized pandas kernel in a
``mapInPandas`` iterator UDF — the shape the reference's recognizer
engines take in the new architecture (SURVEY.md section 2.9): Arrow
batches of many documents in, batches out, heavyweight classifier
state initialized once per python worker (the lazy-init pattern of
tesseract.py:96-98).

Use this path when the classifier genuinely needs Python (learned
models, tokenizers); the HOF path wins whenever the rule is
expression-expressible.  For the built-in classifier the default
``kernel="auto"`` routes through the zero-copy mapInArrow kernel
(operators/extract_arrow.py) — the recommended python-kernel route —
and the pandas kernel here remains the compatibility escape hatch for
pandas-in/pandas-out classifiers.  Tests pin exact output equality
across all paths.

The kernel is flat-array vectorized: one flatten pass over the Arrow
batch, then numpy gathers (np.repeat / lexsort / bincount-cumsum) for
the stable sort, boilerplate keep-mask, dense per-doc order, and the
regroup — no per-row pandas indexing and no per-document Python round
trips.  The only Python-object work left is the unavoidable
dict<->struct boundary of nested Arrow data in pandas UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_project_spark.functions.fuse import fuse_media_candidates

_OUT_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,order:int>>, "
    "status struct<ok:boolean,reason:string>"
)


def _doc_statuses(doc_ids: np.ndarray, spans_col: list) -> list[str | None]:
    """Never-fail input validation, mirroring extract.doc_status_expr
    (null_doc_id / null_spans / malformed_span, checked in that order);
    None means ok."""
    out: list[str | None] = [None] * len(spans_col)
    for i, s in enumerate(spans_col):
        if doc_ids[i] is None:
            out[i] = "null_doc_id"
        elif s is None:
            out[i] = "null_spans"
        elif any(
            d is None or d["offset"] is None or d["kind"] is None for d in s
        ):
            out[i] = "malformed_span"
    return out


def _assemble_batch(pdf: pd.DataFrame, classify) -> pd.DataFrame:
    """Vectorized per-batch assembly: flatten -> classify -> resolve ->
    lexsort -> keep-mask gather -> bincount regroup.  One pass over the
    whole Arrow batch (many documents)."""
    doc_ids = np.array(
        [x if x is not None and x == x else None for x in pdf["doc_id"].tolist()],
        dtype=object,
    )
    spans_col = pdf["spans"].tolist()
    spans_col = [s if isinstance(s, (list, np.ndarray)) else None for s in spans_col]
    fused_col = (
        pdf["fused_map"].tolist() if "fused_map" in pdf else [None] * len(pdf)
    )
    n_docs = len(spans_col)

    reasons = _doc_statuses(doc_ids, spans_col)
    ok = np.array([r is None for r in reasons], dtype=bool)

    counts = np.fromiter(
        (len(s) if (ok[i] and s is not None) else 0 for i, s in enumerate(spans_col)),
        dtype=np.int64,
        count=n_docs,
    )
    total = int(counts.sum())
    doc_pos = np.repeat(np.arange(n_docs), counts)

    if total:
        flat = [d for i, s in enumerate(spans_col) if counts[i] for d in s]
        kind = np.array([d["kind"] for d in flat], dtype=object)
        text = np.array([d["text"] for d in flat], dtype=object)
        media_ref = np.array([d["media_ref"] for d in flat], dtype=object)
        offset = np.fromiter((d["offset"] for d in flat), dtype=np.int64, count=total)
        # storage index within each doc (stable-sort tiebreak):
        # arange minus each row's doc start, all vectorized
        doc_starts = np.cumsum(counts) - counts
        idx = np.arange(total) - np.repeat(doc_starts, counts)

        is_media = kind == "media"
        content = np.asarray(classify(pd.Series(text)), dtype=bool)
        keep = is_media | content

        # media resolution through the fused winner map (python-dict
        # lookup; runs over media rows only)
        resolved = text.copy()
        for i in np.flatnonzero(is_media):
            fm = fused_col[doc_pos[i]]
            if fm:
                hit = fm.get(int(offset[i]))
                if hit is not None:
                    resolved[i] = hit["t"]

        order_sort = np.lexsort((idx, offset, doc_pos))
        kept = order_sort[keep[order_sort]]  # sorted by (doc, offset, idx)
        kd = doc_pos[kept]
        kept_counts = np.bincount(kd, minlength=n_docs)
        kept_starts = np.cumsum(kept_counts) - kept_counts
        dense_order = np.arange(len(kept)) - kept_starts[kd]

        span_dicts = [
            {"kind": k, "text": t, "media_ref": m, "order": int(o)}
            for k, t, m, o in zip(
                kind[kept], resolved[kept], media_ref[kept], dense_order
            )
        ]
        bounds = np.cumsum(kept_counts)
        per_doc = [
            span_dicts[a:b] for a, b in zip(np.r_[0, bounds[:-1]], bounds)
        ]
    else:
        per_doc = [[] for _ in range(n_docs)]

    statuses = [
        {"ok": reasons[i] is None, "reason": reasons[i]} for i in range(n_docs)
    ]
    return pd.DataFrame(
        {"doc_id": doc_ids, "spans": per_doc, "status": statuses}
    )


def extract_pandas_engine(
    docs: DataFrame,
    candidates: DataFrame | None = None,
    classifier="density",
    kernel: str = "auto",
) -> DataFrame:
    """(doc_id, spans) [+ candidates] -> (doc_id, spans out, status),
    via the pandas-API engine path.  Invalid docs surface as
    status.ok=false rows with empty spans (never-fail contract), in
    lockstep with operators/extract.extract.

    ``kernel`` picks the physical python kernel:

      "auto" (default)  the built-in "density" classifier routes
                        through the zero-copy mapInArrow kernel
                        (operators/extract_arrow.py) — measured ~2.7x
                        faster than the pandas kernel, whose residual
                        cost is the Arrow->python-dict conversion of
                        the nested span structs, not the math; a
                        custom/callable classifier (a learned model
                        expecting pandas Series) falls back to the
                        pandas kernel automatically.
      "pandas"          force the vectorized pandas kernel — the
                        compatibility escape hatch for classifiers
                        that genuinely need pandas in/out.
      "arrow"           force the arrow kernel (default classifier
                        only).

    All kernels are row-identical (pinned by tests/test_extract_pandas
    and the shared extraction oracle)."""
    if kernel not in ("auto", "pandas", "arrow"):
        raise ValueError(f"unknown kernel {kernel!r}")
    use_arrow = kernel == "arrow" or (kernel == "auto" and classifier == "density")
    if use_arrow:
        if classifier != "density":
            raise ValueError(
                "kernel='arrow' supports only the built-in 'density' "
                "classifier; pass kernel='pandas' for custom classifiers"
            )
        from ocr_project_spark.operators.extract_arrow import (
            extract_arrow_engine,
        )

        return extract_arrow_engine(docs, candidates)
    if candidates is not None:
        fused = fuse_media_candidates(candidates)
        fused_map = fused.groupBy("doc_id").agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("offset"),
                        F.struct(
                            F.col("text").alias("t"), F.col("confidence").alias("c")
                        ),
                    )
                )
            ).alias("fused_map")
        )
        prepped = docs.join(fused_map, "doc_id", "left")
    else:
        prepped = docs.withColumn(
            "fused_map", F.lit(None).cast("map<int,struct<t:string,c:double>>")
        )

    # A name is resolved lazily per worker against the module-level
    # registry (classifiers registered at import time); a callable is
    # shipped in the task closure via cloudpickle.  Mirrors the
    # reference's name-based discovery with instance registration
    # fallback (engine_manager.py:379-407 vs :55-64).
    classifier_ref = classifier

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Lazy per-worker init (the reference's lazy engine init,
        # tesseract.py:96-98): resolve the classifier once per python
        # worker, outside the batch loop.
        if callable(classifier_ref):
            classify = classifier_ref
        else:
            from ocr_project_spark.functions.engine_udfs import get_classifier

            classify = get_classifier(classifier_ref)
        for pdf in batches:
            yield _assemble_batch(pdf, classify)

    return prepped.mapInPandas(run, schema=_OUT_SCHEMA)
