"""The extraction pipeline's Arrow/pandas-UDF engine path.

Same semantics as operators/extract.py (the built-in-HOF fast path),
but the boilerplate classifier runs as a vectorized pandas kernel —
the shape the reference's recognizer engines take in the new
architecture (SURVEY.md section 2.9): Arrow batches of many documents
in, batches out, heavyweight classifier state initialized per python
worker (the lazy-init pattern of tesseract.py:96-98).

Use this path when the classifier genuinely needs Python (learned
models, tokenizers); the HOF path wins whenever the rule is
expression-expressible.  For the built-in classifier the default
``kernel="auto"`` routes through the zero-copy mapInArrow kernel
(operators/extract_arrow.py) — the recommended python-kernel route —
and the pandas kernel here remains the compatibility escape hatch for
pandas-in/pandas-out classifiers.  Tests pin exact output equality
across all paths.

CLASSIFIER-ONLY CROSSING: the only thing that crosses Arrow is what
the Python classifier actually needs — one ``array<string>`` column
of media-resolved span texts in (resolved JVM-side with the exact
expression the HOF path uses), one ``array<boolean>`` keep mask out,
as a scalar Arrow-batched ``pandas_udf``.  Sort, keep-gather, dense
re-rank, media resolution, and the never-fail status all stay in the
JVM HOF machinery (operators/extract.py's expressions, with the
classifier column swapped in for the built-in predicate).  History:
the first kernel crossed nested span structs (>50% of wall time in
dict conversion), the second crossed four parallel primitive arrays
in and three out (~1.9-2.1x the HOF plan — the round-3/4 "2x bar"
findings); shipping only texts->booleans removes the output payload
and every non-text input column from the crossing entirely.

Inside the kernel everything is flat-array vectorized: one
np.concatenate over the Arrow batch's list cells, one classifier call
over the flat text array, one np.split back to per-doc masks — no
per-row pandas indexing and no per-document Python round trips.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _is_null_cell(x) -> bool:
    """Arrow->pandas renders a NULL list cell as None or NaN depending
    on the batch; treat both as the absent-payload case."""
    return x is None or (isinstance(x, float) and x != x)


def _keep_mask_udf(classifier_ref):
    """Build the scalar Arrow-batched keep-mask UDF around a classifier
    reference: ``array<string>`` resolved span texts per doc in,
    ``array<boolean>`` content mask (storage order) per doc out.

    A name resolves lazily per worker against the module-level registry
    (classifiers registered at import time); a callable ships in the
    task closure via cloudpickle.  Mirrors the reference's name-based
    discovery with instance registration fallback
    (engine_manager.py:379-407 vs :55-64).

    Per batch: one np.concatenate flatten over the list cells, ONE
    classifier call over the flat text array (the vectorization the
    classifier contract promises), one np.split back to per-doc masks.
    A null texts cell (doc with null spans) maps to a null mask — the
    caller's status gate never consults it."""

    def _mask(texts: pd.Series) -> pd.Series:
        # Lazy per-worker init (the reference's lazy engine init,
        # tesseract.py:96-98): resolve once per batch, a dict lookup.
        if callable(classifier_ref):
            classify = classifier_ref
        else:
            from ocr_project_spark.functions.engine_udfs import get_classifier

            classify = get_classifier(classifier_ref)

        cells = texts.to_numpy(dtype=object)
        n = len(cells)
        null_cell = np.fromiter(
            (_is_null_cell(c) for c in cells), dtype=bool, count=n
        )
        counts = np.fromiter(
            (0 if null_cell[i] else len(cells[i]) for i in range(n)),
            dtype=np.int64,
            count=n,
        )
        total = int(counts.sum())
        if total:
            flat = np.concatenate(
                [
                    np.asarray(cells[i], dtype=object)
                    for i in np.flatnonzero(counts)
                ]
            )
            content = np.asarray(classify(pd.Series(flat)), dtype=bool)
            parts = np.split(content, np.cumsum(counts)[:-1])
        else:
            parts = [np.array([], dtype=bool)] * n
        out = pd.Series(parts, dtype=object)
        if null_cell.any():
            out[null_cell] = None
        return out

    return F.pandas_udf(_mask, "array<boolean>")


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
                        (operators/extract_arrow.py); a custom/callable
                        classifier (a learned model expecting pandas
                        Series) falls back to the pandas kernel
                        automatically.
      "pandas"          force the pandas-classifier kernel — the
                        escape hatch for classifiers that genuinely
                        need pandas in/out.  Only resolved texts and a
                        boolean keep mask cross Arrow (module
                        docstring); everything else is the HOF plan.
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

    from ocr_project_spark.operators.extract import (
        SPAN_ARRAY_TYPE,
        _sort_permutation,
        _with_fused_map,
        doc_status_expr,
    )

    prepped = _with_fused_map(
        docs.withColumn("status", doc_status_expr()), candidates
    )

    # JVM-side media resolution — the exact expression of the HOF path
    # (extract.assemble_expr) — feeding the ONLY column that crosses
    # into Python: the per-doc resolved-texts array, in storage order.
    fm = F.col("fused_map")
    resolved_texts = F.transform(
        "spans",
        lambda s: F.when(
            (s["kind"] == F.lit("media"))
            & F.element_at(fm, s["offset"]).isNotNull(),
            F.element_at(fm, s["offset"])["t"],
        ).otherwise(s["text"]),
    )
    with_keep = prepped.withColumn(
        "_keep", _keep_mask_udf(classifier)(resolved_texts)
    )

    # JVM-side assembly: extract.assemble_expr's stable sort + dense
    # re-rank, with the kernel's keep mask (indexed by storage idx)
    # swapped in for the built-in content predicate.  The keep gate is
    # (media | mask) exactly like the HOF plan's (media | is_content);
    # a null mask element gates to False (not-kept), matching the
    # built-in predicate's null semantics.
    spans, keep = F.col("spans"), F.col("_keep")
    kept_pairs = F.filter(
        _sort_permutation(spans),
        lambda p: (
            F.element_at(spans, p["idx"] + 1)["kind"] == F.lit("media")
        )
        | F.coalesce(F.element_at(keep, p["idx"] + 1), F.lit(False)),
    )
    assembled = F.transform(
        kept_pairs,
        lambda p, i: F.struct(
            F.element_at(spans, p["idx"] + 1)["kind"].alias("kind"),
            F.element_at(resolved_texts, p["idx"] + 1).alias("text"),
            F.element_at(spans, p["idx"] + 1)["media_ref"].alias("media_ref"),
            i.cast("int").alias("order"),
        ),
    )
    return with_keep.select(
        "doc_id",
        F.when(F.col("status.ok"), assembled)
        .otherwise(F.array().cast(SPAN_ARRAY_TYPE))
        .alias("spans"),
        "status",
    )
