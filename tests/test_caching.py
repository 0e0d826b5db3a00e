"""The tracked-persist registry (ocr_project_spark.caching): operators
that cache corpus/vocabulary-scale intermediates register the handles
so long-lived drivers can release them after the consuming action —
the documented caching contract of lm_score / dsir_weights /
scrub_passages / semdedup / curate_corpus / bm25_topk(persist_index)."""

from __future__ import annotations

import pytest

from ocr_project_spark import caching


@pytest.fixture(autouse=True)
def _clean_registry():
    caching.release_all()
    yield
    caching.release_all()


def test_track_release_roundtrip(spark):
    df = spark.range(10)
    out = caching.track(df, "t1")
    assert out.storageLevel.useMemory and out.storageLevel.useDisk
    assert caching.live_tags() == {"t1": 1}
    assert caching.release("t1") == 1
    assert caching.live_tags() == {}
    assert not out.storageLevel.useMemory  # actually unpersisted


def test_release_unknown_tag_is_safe():
    assert caching.release("nope") == 0


def test_release_all_spans_tags(spark):
    caching.track(spark.range(1), "a")
    caching.track(spark.range(2), "a")
    caching.track(spark.range(3), "b")
    assert caching.live_tags() == {"a": 2, "b": 1}
    assert caching.release_all() == 3
    assert caching.live_tags() == {}


def test_bm25_persist_index_registers_and_matches(spark):
    """persist_index=True must change only the caching behavior, not
    the ranking, and must register under the bm25_index tag."""
    from ocr_project_spark.operators.similarity import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} " + "beta " * (i % 3)) for i in range(20)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma")],
        "query_id long, query_text string",
    )
    cold = sorted(
        tuple(r)
        for r in bm25_topk(docs, queries, top_n=5, persist_index=False).collect()
    )
    hot = sorted(
        tuple(r)
        for r in bm25_topk(docs, queries, top_n=5, persist_index=True).collect()
    )
    assert hot == cold
    assert caching.live_tags().get("bm25_index") == 1
    assert caching.release("bm25_index") == 1


def test_operator_persists_are_tracked(spark):
    """The four retrofitted operators register their internal persists
    under their own tags (the ADVICE-r4 leak: persisted tables callers
    could never release)."""
    from ocr_project_spark.operators.curate import dsir_weights, lm_score

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over") for i in range(12)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100 + i, "quick brown fox runs fast") for i in range(4)],
        "doc_id long, text string",
    )
    lm_score(docs).count()
    assert "lm_score" in caching.live_tags()
    dsir_weights(docs, target).count()
    assert "dsir_weights" in caching.live_tags()
    released = caching.release_all()
    assert released >= 3  # lm 1 + dsir 2
    assert caching.live_tags() == {}
