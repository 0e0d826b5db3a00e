"""XY-cut layout segmentation: kernel unit tests + Spark grouped-UDF
orchestration (operators/layout.py).
"""

from __future__ import annotations

import numpy as np

from ocr_project_spark.operators.layout import xy_cut_order, xy_cut_reading_order


def boxes(*b):
    a = np.array(b, dtype=float)
    return a[:, 0], a[:, 1], a[:, 2], a[:, 3]  # x0, y0, x1, y1


def test_two_column_reads_column_major():
    # col 0: x [0,50]; col 1: x [60,110]; rows y 0/20/40, height 15.
    blocks = [
        (0, 0, 50, 15), (60, 0, 110, 15),
        (0, 20, 50, 35), (60, 20, 110, 35),
        (0, 40, 50, 55), (60, 40, 110, 55),
    ]
    order = xy_cut_order(*boxes(*blocks))
    # vertical gutter (10) beats horizontal gaps (5): column-major
    assert list(order) == [0, 2, 4, 1, 3, 5]


def test_full_width_header_cut_first():
    blocks = [
        (0, 0, 110, 10),                     # header spans both columns
        (0, 20, 50, 35), (60, 20, 110, 35),  # two columns below
        (0, 40, 50, 55), (60, 40, 110, 55),
    ]
    order = xy_cut_order(*boxes(*blocks))
    assert list(order) == [0, 1, 3, 2, 4]


def test_no_gutter_falls_back_to_y_x():
    blocks = [(0, 0, 100, 50), (10, 5, 90, 45), (5, 0, 95, 50)]
    order = xy_cut_order(*boxes(*blocks))
    assert list(order) == [0, 2, 1]  # y0 asc, then x0 asc, then index


def test_singletons_and_empty():
    assert list(xy_cut_order(*boxes((0, 0, 1, 1)))) == [0]
    assert list(xy_cut_order(np.array([]), np.array([]), np.array([]), np.array([]))) == []


def test_permutation_invariance():
    rng = np.random.default_rng(3)
    blocks = [
        (0, 0, 110, 10),
        (0, 20, 50, 35), (60, 20, 110, 35),
        (0, 40, 50, 55), (60, 40, 110, 55),
        (0, 70, 110, 90),
    ]
    base = None
    for _ in range(5):
        perm = rng.permutation(len(blocks))
        shuffled = [blocks[i] for i in perm]
        order = xy_cut_order(*boxes(*shuffled))
        seq = [int(perm[i]) for i in order]  # map back to original ids
        if base is None:
            base = seq
        assert seq == base


def test_spark_xy_cut_matches_kernel(spark):
    # 40 docs, two-column layout with varying row counts
    rows = []
    for d in range(40):
        nb = 4 + d % 5
        for i in range(nb):
            col, r = i % 2, i // 2
            rows.append((f"doc-{d}", i, col * 60.0, r * 20.0, col * 60.0 + 50.0, r * 20.0 + 15.0))
    df = spark.createDataFrame(rows, "doc_id string, block_id int, x0 double, y0 double, x1 double, y1 double")
    got = {
        (r["doc_id"], r["block_id"]): r["reading_order"]
        for r in xy_cut_reading_order(df).collect()
    }
    for d in range(40):
        nb = 4 + d % 5
        x0, y0, x1, y1 = boxes(
            *[(i % 2 * 60, i // 2 * 20, i % 2 * 60 + 50, i // 2 * 20 + 15) for i in range(nb)]
        )
        perm = xy_cut_order(x0, y0, x1, y1)
        for ro, bid in enumerate(perm):
            assert got[(f"doc-{d}", int(bid))] == ro
