"""BPE tokenizer tier: hand-computed merge learning, distributed
apply pinned against the pure-python reference, word_tokens lockstep,
pack_sequences composition."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_project_spark.functions.bpe import (
    EOW,
    _words,
    apply_bpe,
    bpe_encode,
    learn_bpe,
)


def test_learn_bpe_hand_computed(spark):
    # classic tiny example: 'low' x5, 'lowest' x2 -> first merges build
    # up the shared 'low' stem deterministically (ties lexicographic)
    docs = spark.createDataFrame(
        [(i, "low") for i in range(5)] + [(10, "lowest"), (11, "lowest")],
        "doc_id long, text string",
    )
    merges = learn_bpe(docs, n_merges=3, sample_docs=100)
    assert merges[0] == ("l", "o")        # 'lo' appears in all 7 words
    assert merges[1] == ("lo", "w")       # then 'low' in all 7
    # third merge: 'low</w>' (freq 5) beats the 'lowest' suffix pairs
    assert merges[2] == ("low", EOW)


def test_bpe_encode_reference_semantics():
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("low", EOW): 2}
    assert bpe_encode("low", ranks) == ["low" + EOW]
    assert bpe_encode("lowest", ranks) == ["low", "e", "s", "t", EOW]
    # word with no applicable merges stays fully split
    assert bpe_encode("ab", {}) == ["a", "b", EOW]


def test_apply_bpe_matches_python_reference(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    merges = learn_bpe(docs, n_merges=50, sample_docs=100)
    assert len(merges) > 10
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    out = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in apply_bpe(docs, merges).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    assert len(out) == len(rows)
    for r in rows:
        ws = _words(r.text)
        want = sum(len(bpe_encode(w, ranks)) for w in ws)
        assert out[r.doc_id] == (len(ws), want)
        # every word yields at least one subword
        assert out[r.doc_id][1] >= out[r.doc_id][0]


def test_apply_bpe_token_array_and_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "low lowest"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    merges = [("l", "o"), ("lo", "w"), ("low", EOW)]
    rows = {
        r.doc_id: r
        for r in apply_bpe(docs, merges, return_tokens=True).collect()
    }
    assert rows[1].bpe_tokens == ["low" + EOW, "low", "e", "s", "t", EOW]
    assert rows[1].n_bpe_tokens == 6 and rows[1].n_words == 2
    assert rows[2].n_bpe_tokens == 0 and rows[2].bpe_tokens == []
    assert rows[3].n_bpe_tokens == 0


def test_words_lockstep_with_word_tokens(spark):
    from ocr_project_spark.functions.text import word_tokens

    texts = ["Héllo, WORLD-42!", "", None, "a..b  c\nd", "ONE1 two2"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    spark_toks = {
        r.i: r.t for r in df.select("i", word_tokens(F.col("text")).alias("t")).collect()
    }
    for i, t in enumerate(texts):
        assert spark_toks[i] == _words(t), (i, t)


def test_bpe_composes_with_pack_sequences(spark):
    from ocr_project_spark.operators.pack import pack_sequences

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    merges = learn_bpe(docs, n_merges=30, sample_docs=60)
    counted = apply_bpe(docs, merges)
    packed = pack_sequences(
        counted.select("doc_id", "n_bpe_tokens"),
        budget=2048,
        tokens_col="n_bpe_tokens",
    )
    assert packed.count() == 60
    # no pack exceeds the budget (oversize single docs get their own pack)
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c"))
        .where((F.col("s") > 2048) & (F.col("c") > 1))
    )
    assert over.count() == 0
