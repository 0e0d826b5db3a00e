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
expression-expressible.  Tests pin exact output equality between the
two paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_project_spark.functions.fuse import fuse_media_candidates
from ocr_project_spark.operators.extract import valid_documents

_OUT_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,order:int>>"
)


def _assemble_batch(pdf: pd.DataFrame, classify) -> pd.DataFrame:
    """Vectorized per-batch assembly: explode -> classify -> resolve ->
    stable sort -> regroup.  One pandas pass over the whole Arrow batch
    (many documents), no per-document Python round trips."""
    doc_ids = pdf["doc_id"].to_numpy()
    spans_col = pdf["spans"].tolist()
    fused_col = pdf["fused_map"].tolist() if "fused_map" in pdf else [None] * len(pdf)

    counts = np.fromiter(
        (len(s) if s is not None else 0 for s in spans_col),
        dtype=np.int64,
        count=len(spans_col),
    )
    doc_pos = np.repeat(np.arange(len(spans_col)), counts)
    flat: list = []
    for s in spans_col:
        if s is not None:
            flat.extend(s)

    if flat:
        kind = pd.Series([d["kind"] for d in flat], dtype="object")
        text = pd.Series([d["text"] for d in flat], dtype="object")
        media_ref = pd.Series([d["media_ref"] for d in flat], dtype="object")
        offset = np.fromiter((d["offset"] for d in flat), dtype=np.int64, count=len(flat))
        # storage index within each doc (stable-sort tiebreak)
        idx = np.concatenate([np.arange(c) for c in counts if c > 0]) if counts.sum() else np.array([], dtype=np.int64)

        is_media = (kind == "media").to_numpy()
        content = classify(text)
        keep = is_media | content

        # media resolution through the fused winner map
        resolved = text.copy()
        for i in np.nonzero(is_media)[0]:
            fm = fused_col[doc_pos[i]]
            if fm is not None:
                hit = fm.get(int(offset[i]))
                if hit is not None:
                    resolved.iloc[i] = hit["t"] if isinstance(hit, dict) else hit["t"]

        order_sort = np.lexsort((idx, offset, doc_pos))
        kept_sorted = [j for j in order_sort if keep[j]]
    else:
        kept_sorted = []

    out_spans: list[list[dict]] = [[] for _ in range(len(spans_col))]
    for j in kept_sorted:
        p = int(doc_pos[j])
        out_spans[p].append(
            dict(
                kind=kind.iloc[j],
                text=resolved.iloc[j],
                media_ref=media_ref.iloc[j],
                order=len(out_spans[p]),
            )
        )
    # null spans arrays stay null (parity with the HOF path)
    result = [
        None if spans_col[i] is None else out_spans[i] for i in range(len(spans_col))
    ]
    return pd.DataFrame({"doc_id": doc_ids, "spans": result})


def extract_pandas_engine(
    docs: DataFrame,
    candidates: DataFrame | None = None,
    classifier="density",
) -> DataFrame:
    """(doc_id, spans) [+ candidates] -> (doc_id, spans out), via the
    pandas-UDF engine path."""
    docs = valid_documents(docs)
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
