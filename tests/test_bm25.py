"""bm25_topk: hand-computed Okapi/Lucene scoring, ranking contract,
min_df pruning, and query-term-miss behavior."""

from __future__ import annotations

import math

import pytest

from ocr_project_spark.operators.similarity import bm25_topk

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "cherry cherry cherry cherry"),
]


def _score(pairs, n_docs, avgdl, k1=1.2, b=0.75):
    """Reference scoring: pairs = [(tf, df, dl), ...] per matched term.
    Mirrors the engine's integer-micro ladder: each part rounds to a
    micro int, the sum is exact, the 4-decimal cut is integer div."""
    m = 0
    for tf, df, dl in pairs:
        idf = round(math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
        norm = k1 * ((1.0 - b) + (b * dl) / avgdl)
        m += round(idf * tf * (k1 + 1.0) / (tf + norm) * 1e6)
    return ((m + 50) // 100) / 1e4


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "apple cherry")], "query_id long, query_text string"
    )
    rows = {r.doc_id: r for r in bm25_topk(docs, q).collect()}
    # N=3 docs, dl = 3/2/4, avgdl = 3
    assert set(rows) == {1, 2, 3}
    assert rows[1].score == pytest.approx(_score([(2, 1, 3)], 3, 3.0), abs=1e-9)
    assert rows[2].score == pytest.approx(_score([(1, 2, 2)], 3, 3.0), abs=1e-9)
    assert rows[3].score == pytest.approx(_score([(4, 2, 4)], 3, 3.0), abs=1e-9)
    # rank is dense 1..n by score desc
    by_rank = sorted(rows.values(), key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == [1, 2, 3]
    assert by_rank[0].score >= by_rank[1].score >= by_rank[2].score


def test_bm25_top_n_cut_and_multi_query(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "cherry"), (1, "banana")], "query_id long, query_text string"
    )
    out = bm25_topk(docs, q, top_n=1).collect()
    best = {r.query_id: r.doc_id for r in out}
    assert len(out) == 2
    # cherry: d3 (tf=4) beats d2 (tf=1); banana: equal tf=1 but shorter
    # d2 (dl=2) outranks d1 (dl=3) on length normalization
    assert best[0] == 3
    assert best[1] == 2


def test_bm25_repeated_query_terms_ignored(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q1 = spark.createDataFrame(
        [(0, "apple apple apple")], "query_id long, query_text string"
    )
    q2 = spark.createDataFrame([(0, "apple")], "query_id long, query_text string")
    a = sorted((r.doc_id, r.score) for r in bm25_topk(docs, q1).collect())
    b = sorted((r.doc_id, r.score) for r in bm25_topk(docs, q2).collect())
    assert a == b


def test_bm25_min_df_prunes_rare_terms(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "apple cherry")], "query_id long, query_text string"
    )
    pruned = {r.doc_id: r.score for r in bm25_topk(docs, q, min_df=2).collect()}
    # apple (df=1) is pruned entirely -> d1 gets no score row
    assert set(pruned) == {2, 3}
    assert pruned[3] == pytest.approx(_score([(4, 2, 4)], 3, 3.0), abs=1e-9)


def test_bm25_unmatched_query_yields_no_rows(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "zzz qqq"), (1, None)], "query_id long, query_text string"
    )
    assert bm25_topk(docs, q).count() == 0


# ------------------------------------------------------------ rrf_fuse
def test_rrf_hand_computed_and_tiebreak(spark):
    from ocr_project_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, doc_id long, rank int",
    )
    rows = {r.doc_id: r for r in rrf_fuse([a, b], k=60, top_n=10).collect()}

    def rr(rank):
        return round(round(1.0 / (60.0 + rank), 6) * 1e6)

    def fuse(*ranks):
        return ((sum(rr(r) for r in ranks) + 50) // 100) / 1e4

    assert rows[11].rrf_score == pytest.approx(fuse(2, 1), abs=1e-9)
    assert rows[11].n_lists == 2
    assert rows[10].rrf_score == pytest.approx(fuse(1), abs=1e-9)
    assert rows[10].n_lists == 1
    # doc 11 (in both lists) outranks everything
    assert rows[11].rank == 1
    # doc 10 (rank 1 in a) and doc 13 (rank 2 in b): rr(1) > rr(2)
    assert rows[10].rank == 2 and rows[13].rank > rows[10].rank


def test_rrf_n_lists_tiebreak_and_top_n(spark):
    from ocr_project_spark.operators.similarity import rrf_fuse

    # doc 20 appears once at rank 1; docs 21/22 appear in both lists at
    # ranks that sum to the same reciprocal total only if constructed —
    # here use identical ranks so scores tie exactly and n_lists breaks it
    a = spark.createDataFrame(
        [(0, 20, 1), (0, 21, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 21, 2), (0, 22, 1)], "query_id long, doc_id long, rank int"
    )
    out = rrf_fuse([a, b], top_n=2).collect()
    assert len(out) == 2
    by_rank = sorted(out, key=lambda r: r.rank)
    # doc 21: rr(2)+rr(2) = 2/62 > 1/61 = doc 20/22's score
    assert by_rank[0].doc_id == 21 and by_rank[0].n_lists == 2
    # doc 20 vs 22 tie at rr(1); doc_id ascending breaks it
    assert by_rank[1].doc_id == 20


def test_rrf_requires_two_rankings(spark):
    from ocr_project_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(0, 1, 1)], "query_id long, doc_id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse([a])


def test_bm25_grid_slices_match_single_param_runs(spark):
    """Each param_id slice of bm25_topk_grid is row-identical to the
    corresponding bm25_topk run — same expression chain, rounding
    ladder, and tie-break, from ONE shared postings build."""
    from ocr_project_spark.operators.similarity import bm25_topk_grid

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(0, "apple cherry"), (1, "banana")],
        "query_id long, query_text string",
    )
    params = [(1.2, 0.75), (2.0, 0.0)]
    grid = bm25_topk_grid(docs, qs, params=params, top_n=2)
    rows = grid.collect()
    for i, (k1, b) in enumerate(params):
        single = sorted(
            (r.query_id, r.doc_id, r.score, r.rank)
            for r in bm25_topk(docs, qs, k1=k1, b=b, top_n=2).collect()
        )
        slice_i = sorted(
            (r.query_id, r.doc_id, r.score, r.rank)
            for r in rows
            if r.param_id == i
        )
        assert slice_i == single, f"param {i} diverged"


def test_bm25_grid_rejects_empty_params(spark):
    from ocr_project_spark.operators.similarity import bm25_topk_grid

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame([(0, "apple")], "query_id long, query_text string")
    with pytest.raises(ValueError):
        bm25_topk_grid(docs, qs, params=[])


def test_rrf_long_form_equals_list_form(spark):
    """rrf_fuse over a pre-unioned long table (bm25_topk_grid's shape)
    fuses identically to the list-of-DataFrames form."""
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 20, 1), (0, 21, 2), (1, 30, 1)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(0, 21, 1), (0, 22, 2), (1, 30, 2)],
        "query_id long, doc_id long, rank int",
    )
    long = a.withColumn("param_id", F.lit(0)).unionByName(
        b.withColumn("param_id", F.lit(1))
    )
    want = sorted(
        (r.query_id, r.doc_id, r.rrf_score, r.n_lists, r.rank)
        for r in rrf_fuse([a, b], top_n=3).collect()
    )
    got = sorted(
        (r.query_id, r.doc_id, r.rrf_score, r.n_lists, r.rank)
        for r in rrf_fuse(long, top_n=3).collect()
    )
    assert got == want
