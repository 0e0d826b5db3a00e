"""Arrow engine path (mapInArrow, zero-copy nested data) equivalence:
byte-identical span sequences and statuses vs the HOF plan."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_project_spark import schema
from ocr_project_spark.operators.extract import extract
from ocr_project_spark.operators.extract_arrow import (
    density_content_mask,
    extract_arrow_engine,
)


def to_dict(df):
    return {
        r["doc_id"]: (
            tuple(r["status"]),
            [tuple(s) for s in (r["spans"] or [])],
        )
        for r in df.collect()
    }


def test_arrow_engine_matches_hof(corpus_dfs):
    docs_df, cands_df = corpus_dfs
    hof = to_dict(extract(docs_df, cands_df))
    arrow = to_dict(extract_arrow_engine(docs_df, cands_df))
    assert set(hof) == set(arrow)
    bad = [k for k in hof if hof[k] != arrow[k]]
    assert not bad, f"{len(bad)} docs differ; first: {bad[0]}"


def test_arrow_engine_without_candidates(corpus_dfs):
    docs_df, _ = corpus_dfs
    assert to_dict(extract(docs_df, None)) == to_dict(
        extract_arrow_engine(docs_df, None)
    )


def test_arrow_engine_status_rows(spark):
    docs = [
        (None, [("text", "a b c d e f g h i", None, 0)]),
        ("d_null_spans", None),
        ("d_bad_offset", [("text", "x y z w q r s t", None, None)]),
        ("d_ok", [("text", "one two three four five six seven eight", None, 0)]),
        ("d_empty", []),
    ]
    df = spark.createDataFrame(docs, schema.DOCUMENTS_SPANS)
    got = to_dict(extract_arrow_engine(df, None))
    want = to_dict(extract(df, None))
    assert got == want
    assert got["d_null_spans"][0] == (False, "null_spans")
    assert got["d_bad_offset"][0] == (False, "malformed_span")
    assert got[None][0] == (False, "null_doc_id")


def test_density_mask_matches_rules():
    from ocr_project_spark import rules

    texts = [
        "one two three four five six seven eight",
        "<a> <a> <a> <a> <a> <a> one two",      # adjacent link tokens
        "a <a> b <a> c d e f g h",
        "x<a>y one two three four five six seven",  # substring, not token
        " \t padded   tokens here a b c d e ",
        "",
        None,
        "short one",
    ]
    got = density_content_mask(pa.array(texts, type=pa.string()))
    want = np.array([rules.is_content(t) for t in texts])
    assert (got == want).all(), list(zip(texts, got, want))
