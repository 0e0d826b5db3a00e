"""The extraction pipeline's Arrow/pandas-UDF engine path.

Same semantics as operators/extract.py (the built-in-HOF fast path),
but the per-document keep/sort/regroup runs as a vectorized pandas
kernel in a ``mapInPandas`` iterator UDF — the shape the reference's
recognizer engines take in the new architecture (SURVEY.md section
2.9): Arrow batches of many documents in, batches out, heavyweight
classifier state initialized once per python worker (the lazy-init
pattern of tesseract.py:96-98).

Use this path when the classifier genuinely needs Python (learned
models, tokenizers); the HOF path wins whenever the rule is
expression-expressible.  For the built-in classifier the default
``kernel="auto"`` routes through the zero-copy mapInArrow kernel
(operators/extract_arrow.py) — the recommended python-kernel route —
and the pandas kernel here remains the compatibility escape hatch for
pandas-in/pandas-out classifiers.  Tests pin exact output equality
across all paths.

The kernel crossing is PARALLEL PRIMITIVE ARRAYS, not nested structs
(SURVEY.md section 1.2's prescription): the JVM side projects the
span-struct array into four flat columns (kinds, texts, refs,
offsets) with codegen'd ``transform``s — media fusion is resolved
JVM-side with the exact expression the HOF path uses, so the kernel
never sees the fused map — and the kernel returns the kept kinds/
texts/refs arrays, which the JVM re-zips into the output struct array
(``arrays_zip`` + indexed ``transform``).  Nothing dict-shaped ever
crosses Arrow in either direction; the earlier struct-crossing kernel
spent >50% of its wall time converting nested span structs to python
dicts and back (BASELINE.md, extract_pipeline_pandas_kernel history).

Inside the kernel everything is flat-array vectorized: one flatten
pass over the Arrow batch, then numpy gathers (np.repeat / lexsort /
bincount-cumsum) for the stable sort, boilerplate keep-mask, dense
per-doc order, and the regroup — no per-row pandas indexing and no
per-document Python round trips.
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_project_spark.functions.fuse import fuse_media_candidates

# Flat crossing schemas: primitive arrays only (see module docstring).
_KERNEL_IN_COLS = ["doc_id", "kinds", "texts", "refs", "offsets"]
_KERNEL_OUT_SCHEMA = (
    "doc_id string, kinds array<string>, texts array<string>, "
    "refs array<string>, ok boolean, reason string"
)


def _is_null_cell(x) -> bool:
    """Arrow->pandas renders a NULL list cell as None or NaN depending
    on the batch; treat both as the absent-payload case."""
    return x is None or (isinstance(x, float) and x != x)


def _assemble_batch(pdf: pd.DataFrame, classify) -> pd.DataFrame:
    """Vectorized per-batch assembly over parallel primitive arrays:
    flatten -> classify -> lexsort -> keep-mask gather -> bincount
    regroup.  One pass over the whole Arrow batch (many documents);
    media text is already resolved JVM-side."""
    n_docs = len(pdf)
    doc_ids = np.array(
        [None if _is_null_cell(x) else x for x in pdf["doc_id"].tolist()],
        dtype=object,
    )
    kinds_col = pdf["kinds"].tolist()
    texts_col = pdf["texts"].tolist()
    refs_col = pdf["refs"].tolist()
    offs_col = pdf["offsets"].tolist()

    # Never-fail validation, mirroring extract.doc_status_expr
    # (null_doc_id / null_spans / malformed_span, checked in order).
    # A NULL span element surfaces as a null kind AND offset cell, so
    # the per-element check covers it.
    reasons: list[str | None] = [None] * n_docs
    for i in range(n_docs):
        ks = kinds_col[i]
        if doc_ids[i] is None:
            reasons[i] = "null_doc_id"
        elif _is_null_cell(ks):
            reasons[i] = "null_spans"
        elif any(k is None for k in ks) or any(
            _is_null_cell(o) for o in offs_col[i]
        ):
            reasons[i] = "malformed_span"
    ok = np.array([r is None for r in reasons], dtype=bool)

    counts = np.fromiter(
        (len(kinds_col[i]) if ok[i] else 0 for i in range(n_docs)),
        dtype=np.int64,
        count=n_docs,
    )
    total = int(counts.sum())
    doc_pos = np.repeat(np.arange(n_docs), counts)

    if total:
        sel = np.flatnonzero(counts)
        kind = np.fromiter(
            chain.from_iterable(kinds_col[i] for i in sel),
            dtype=object,
            count=total,
        )
        text = np.fromiter(
            chain.from_iterable(texts_col[i] for i in sel),
            dtype=object,
            count=total,
        )
        media_ref = np.fromiter(
            chain.from_iterable(refs_col[i] for i in sel),
            dtype=object,
            count=total,
        )
        offset = np.fromiter(
            chain.from_iterable(offs_col[i] for i in sel),
            dtype=np.int64,
            count=total,
        )
        # storage index within each doc (stable-sort tiebreak):
        # arange minus each row's doc start, all vectorized
        doc_starts = np.cumsum(counts) - counts
        idx = np.arange(total) - np.repeat(doc_starts, counts)

        is_media = kind == "media"
        content = np.asarray(classify(pd.Series(text)), dtype=bool)
        keep = is_media | content

        order_sort = np.lexsort((idx, offset, doc_pos))
        kept = order_sort[keep[order_sort]]  # sorted by (doc, offset, idx)
        kd = doc_pos[kept]
        kept_counts = np.bincount(kd, minlength=n_docs)
        cuts = np.cumsum(kept_counts)[:-1]

        kinds_out = [a.tolist() for a in np.split(kind[kept], cuts)]
        texts_out = [a.tolist() for a in np.split(text[kept], cuts)]
        refs_out = [a.tolist() for a in np.split(media_ref[kept], cuts)]
    else:
        kinds_out = [[] for _ in range(n_docs)]
        texts_out = [[] for _ in range(n_docs)]
        refs_out = [[] for _ in range(n_docs)]

    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "kinds": kinds_out,
            "texts": texts_out,
            "refs": refs_out,
            "ok": ok,
            "reason": np.array(reasons, dtype=object),
        }
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
                        (operators/extract_arrow.py); a custom/callable
                        classifier (a learned model expecting pandas
                        Series) falls back to the pandas kernel
                        automatically.
      "pandas"          force the vectorized pandas kernel — the
                        escape hatch for classifiers that genuinely
                        need pandas in/out.  The crossing is parallel
                        primitive arrays (module docstring), so its
                        cost is within ~2x of the pure-HOF plan.
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

    # JVM-side media resolution + flattening to parallel primitive
    # arrays — the exact resolution expression of the HOF path
    # (extract.assemble_expr), so the kernel never crosses a map or a
    # struct through Arrow.
    fm = F.col("fused_map")
    flat = prepped.select(
        "doc_id",
        F.transform("spans", lambda s: s["kind"]).alias("kinds"),
        F.transform(
            "spans",
            lambda s: F.when(
                (s["kind"] == F.lit("media"))
                & F.element_at(fm, s["offset"]).isNotNull(),
                F.element_at(fm, s["offset"])["t"],
            ).otherwise(s["text"]),
        ).alias("texts"),
        F.transform("spans", lambda s: s["media_ref"]).alias("refs"),
        F.transform("spans", lambda s: s["offset"]).alias("offsets"),
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

    raw = flat.mapInPandas(run, schema=_KERNEL_OUT_SCHEMA)
    # Re-zip the parallel arrays into the span structs JVM-side; the
    # dense per-doc ``order`` is just the post-keep position, so the
    # indexed transform reconstructs it for free.
    return raw.select(
        "doc_id",
        F.transform(
            F.arrays_zip("kinds", "texts", "refs"),
            lambda x, i: F.struct(
                x["kinds"].alias("kind"),
                x["texts"].alias("text"),
                x["refs"].alias("media_ref"),
                i.cast("int").alias("order"),
            ),
        ).alias("spans"),
        F.struct(F.col("ok"), F.col("reason")).alias("status"),
    )
