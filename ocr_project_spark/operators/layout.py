"""Recursive XY-cut layout segmentation -> reading order.

The 2-D analog of the reference's layout-reconstruction stage: the
reference sorts regions geometrically (center_y, x), groups them into
lines by adaptive y-gaps and re-sorts within lines
(/root/reference/src/advanced_ocr/engines/paddleocr.py:281-399,
tesseract.py:392-472, easyocr.py:280-393 — three near-identical
copies).  That gap-walking is a degenerate one-level XY-cut; PDF-layout
documents need the full recursive form: repeatedly split the block set
at the widest empty gutter (horizontal or vertical projection gap),
reading top-before-bottom and left-before-right, until no gutter
remains, then fall back to (y0, x0) order.

Spark shape: one grouped-map pandas UDF (``applyInPandas`` keyed by
doc_id) running the vectorized NumPy kernel per document within each
Arrow batch — the per-doc group is tiny (blocks of one page), the
corpus-level parallelism is the groupBy hash shuffle.  No per-row
Python.  The kernel is shared verbatim with the pure-Python oracle
(tests/test_layout.py) so equality tests verify orchestration, not two
divergent implementations (SURVEY.md section 7.5 item 5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

BLOCKS_OUT_SCHEMA = "doc_id string, block_id int, reading_order int"


def _widest_gap(lo: np.ndarray, hi: np.ndarray) -> tuple[float, float]:
    """Widest empty gap in the 1-D projection of [lo, hi) intervals.

    Returns (gap_width, cut_position); gap_width <= 0 means the
    projection has no empty gutter.
    """
    order = np.argsort(lo, kind="stable")
    lo_s, hi_s = lo[order], hi[order]
    run_hi = np.maximum.accumulate(hi_s)
    # gap between interval i's running max-hi and interval i+1's lo
    gaps = lo_s[1:] - run_hi[:-1]
    if len(gaps) == 0:
        return 0.0, 0.0
    k = int(np.argmax(gaps))
    return float(gaps[k]), float((run_hi[k] + lo_s[k + 1]) / 2.0)


def xy_cut_order(
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray
) -> np.ndarray:
    """Reading-order permutation of block indices by recursive XY-cut.

    Cut policy: take the axis with the widest gutter (ties prefer the
    horizontal cut, i.e. splitting on y — top content reads first, the
    convention of the classic XY-cut formulation); recurse top/left
    half before bottom/right; leaves order by (y0, x0, index).
    """
    x0 = np.asarray(x0, dtype=float)
    y0 = np.asarray(y0, dtype=float)
    x1 = np.asarray(x1, dtype=float)
    y1 = np.asarray(y1, dtype=float)
    out: list[int] = []

    def rec(ids: np.ndarray) -> None:
        if len(ids) <= 1:
            out.extend(int(i) for i in ids)
            return
        gy, cy = _widest_gap(y0[ids], y1[ids])   # horizontal cut
        gx, cx = _widest_gap(x0[ids], x1[ids])   # vertical cut
        if gy <= 0 and gx <= 0:
            key = np.lexsort((ids, x0[ids], y0[ids]))
            out.extend(int(i) for i in ids[key])
            return
        if gy >= gx:
            top = ids[y0[ids] < cy]
            bottom = ids[y0[ids] >= cy]
            rec(top), rec(bottom)
        else:
            left = ids[x0[ids] < cx]
            right = ids[x0[ids] >= cx]
            rec(left), rec(right)

    rec(np.arange(len(x0)))
    return np.asarray(out, dtype=np.int64)


def _order_group(pdf: pd.DataFrame) -> pd.DataFrame:
    frames = []
    for doc_id, g in pdf.groupby("doc_id", sort=False):
        perm = xy_cut_order(
            g["x0"].to_numpy(), g["y0"].to_numpy(),
            g["x1"].to_numpy(), g["y1"].to_numpy(),
        )
        block_ids = g["block_id"].to_numpy()[perm]
        frames.append(
            pd.DataFrame(
                {
                    "doc_id": doc_id,
                    "block_id": block_ids.astype("int32"),
                    "reading_order": np.arange(len(perm), dtype="int32"),
                }
            )
        )
    if not frames:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="str"),
             "block_id": pd.Series(dtype="int32"),
             "reading_order": pd.Series(dtype="int32")}
        )
    return pd.concat(frames, ignore_index=True)


def xy_cut_reading_order(blocks: DataFrame) -> DataFrame:
    """(doc_id, block_id, x0, y0, x1, y1) -> (doc_id, block_id,
    reading_order) via recursive XY-cut per document.

    Scale: the groupBy(doc_id) shuffle is the only exchange; AQE skew
    splitting plus the salting policy of plans/partitioning.py keep the
    grouped UDF balanced.  One page's blocks always fit one task.
    """
    id_type = blocks.schema["doc_id"].dataType.simpleString()
    out_schema = f"doc_id {id_type}, block_id int, reading_order int"
    return (
        blocks.select("doc_id", "block_id", "x0", "y0", "x1", "y1")
        .groupBy("doc_id")
        .applyInPandas(_order_group, out_schema)
    )
