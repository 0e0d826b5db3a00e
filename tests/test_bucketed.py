"""Bucketed-storage pipeline: exchange-free plan, exact output
equality with the shuffled path (sources/bucketed.py).
"""

from __future__ import annotations

from ocr_project_spark.operators.extract import extract
from ocr_project_spark.sources.bucketed import read_bucketed, write_bucketed


def to_dict(df):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in (r["spans"] or [])
        ]
        for r in df.collect()
    }


def test_bucketed_extract_equals_plain_and_is_shuffle_free(spark, corpus_dfs, tmp_path):
    docs_df, cands_df = corpus_dfs
    write_bucketed(spark, docs_df, cands_df, str(tmp_path / "bkt"),
                   n_buckets=8, prefix="t1")
    docs_b, cands_b = read_bucketed(spark, str(tmp_path / "bkt"),
                                    n_buckets=8, prefix="t1")
    assert docs_b.count() == docs_df.count()

    out = extract(docs_b, cands_b)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]

    assert to_dict(out) == to_dict(extract(docs_df, cands_df))


def test_bucketed_survives_catalog_redeclare(spark, corpus_dfs, tmp_path):
    """A fresh catalog entry over the same location inherits bucketing —
    the sandbox analog of an Iceberg catalog lookup from a new job."""
    docs_df, cands_df = corpus_dfs
    write_bucketed(spark, docs_df, cands_df, str(tmp_path / "bkt2"),
                   n_buckets=8, prefix="t2")
    spark.sql("DROP TABLE t2_documents_spans")
    spark.sql("DROP TABLE t2_media_candidates")
    docs_b, cands_b = read_bucketed(spark, str(tmp_path / "bkt2"),
                                    n_buckets=8, prefix="t2")
    out = extract(docs_b, cands_b)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert to_dict(out) == to_dict(extract(docs_df, cands_df))


def test_bucketed_lang_filter_stays_shuffle_free(spark, corpus_dfs, tmp_path):
    """The language-filter join (candidates x corpus-derived doc_langs)
    rides the storage bucketing: zero Exchange in the full pipeline,
    and the shuffle_hash pin keeps the corpus-sized language table off
    the broadcast path (a serial build that cannot exist at 10^12
    docs)."""
    from ocr_project_spark.functions.fuse import (
        doc_langs_from_spans,
        filter_candidates_by_language,
    )

    docs_df, cands_df = corpus_dfs
    write_bucketed(spark, docs_df, cands_df, str(tmp_path / "bkt3"),
                   n_buckets=8, prefix="t3")
    docs_b, cands_b = read_bucketed(spark, str(tmp_path / "bkt3"),
                                    n_buckets=8, prefix="t3")
    cfg = {"engines": {"rec_a": {"languages": ["fr"]}}}
    filtered = filter_candidates_by_language(
        cands_b, doc_langs_from_spans(docs_b), cfg
    )
    out = extract(docs_b, filtered)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    # equality with the plain-path filtered pipeline
    plain = extract(
        docs_df,
        filter_candidates_by_language(
            cands_df, doc_langs_from_spans(docs_df), cfg
        ),
    )
    assert to_dict(out) == to_dict(plain)
