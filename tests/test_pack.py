"""Sequence packing (operators/pack.py): budget respected, greedy
boundary tightness, oversized-doc own-pack rule, conservation,
determinism given a fixed partitioning, and the kernel's pure
numpy pack-jump helper against a python greedy reference."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_project_spark.operators.pack import _pack_bounds, pack_sequences


def _greedy_reference(counts, budget):
    """Two-field state machine: a doc opens a new pack iff the open
    pack has >= 1 member and would overflow.  The guard is on MEMBER
    COUNT, not acc > 0: a zero-token doc still occupies the pack, and
    an oversized doc following it must not join (kernel + SQL oracle
    agree — a pack is a maximal range with sum <= budget)."""
    out, pack, acc, n_in = [], 0, 0, 0
    for c in counts:
        if n_in > 0 and acc + c > budget:
            pack += 1
            acc = 0
            n_in = 0
        acc += c
        n_in += 1
        out.append(pack)
    return out


@pytest.mark.parametrize(
    "counts",
    [
        [5, 5, 5, 5],
        [10, 1, 10, 1],
        [25, 1, 1],          # oversized first
        [1, 25, 1],          # oversized mid
        [1] * 37,
        [],
        [10, 10, 10],        # exact fits
        [0, 25, 1],          # oversized after a zero-token doc
        [25, 0],             # zero-token doc after an oversized one
        [0, 0, 0],           # all-empty docs share one pack
        [5, 0, 25, 0, 5],    # zeros interleaved
    ],
)
def test_pack_bounds_matches_greedy_reference(counts):
    import numpy as np

    got = list(_pack_bounds(np.array(counts, dtype=np.int64), 10))
    assert got == _greedy_reference(counts, 10)


def test_pack_sequences_invariants(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 200
    packed = pack_sequences(docs.repartition(4, "doc_id"), budget=budget)
    rows = packed.collect()
    # conservation: every doc exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    from collections import defaultdict

    packs = defaultdict(list)
    for r in rows:
        packs[r["pack_id"]].append(r)
    for pid, members in packs.items():
        total = sum(m["n_tokens"] for m in members)
        # budget respected unless a single oversized doc packs alone
        assert total <= budget or len(members) == 1, (pid, total)

    # greedy tightness: within a partition, consecutive packs could
    # not be merged (first doc of pack p+1 would overflow pack p)
    by_part = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["pack_id"].split("-")[0], r["doc_id"])):
        by_part[r["pack_id"].split("-")[0]].append(r)
    for part_rows in by_part.values():
        sums = defaultdict(int)
        order = []
        for r in part_rows:
            if r["pack_id"] not in sums:
                order.append(r["pack_id"])
            sums[r["pack_id"]] += r["n_tokens"]
        firsts = {}
        for r in part_rows:
            firsts.setdefault(r["pack_id"], r["n_tokens"])
        for a, b in zip(order, order[1:]):
            assert sums[a] + firsts[b] > budget, (a, b)


def test_pack_sequences_deterministic_given_partitioning(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        (r["doc_id"], r["pack_id"])
        for r in pack_sequences(docs.repartition(4, "doc_id"), budget=150).collect()
    }
    b = {
        (r["doc_id"], r["pack_id"])
        for r in pack_sequences(docs.repartition(4, "doc_id"), budget=150).collect()
    }
    assert a == b


def test_pack_sequences_precomputed_tokens_and_errors(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 5)], "doc_id long, ntok long"
    )
    rows = pack_sequences(
        docs.coalesce(1), budget=20, tokens_col="ntok"
    ).collect()
    packs = {r["doc_id"]: r["pack_id"] for r in rows}
    assert packs[1] == packs[2] != packs[3]
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0, tokens_col="ntok")


def test_pack_streaming_state_carries_across_arrow_batches(spark):
    """Multiple Arrow batches per partition must produce the identical
    packing as one batch — the carried (pack, acc, members) state is
    exact, including an open pack straddling a batch boundary."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    docs = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(100)], "doc_id long, ntok long"
    ).coalesce(1)
    try:
        spark.conf.set(key, "7")
        chunked = {
            r["doc_id"]: r["pack_id"]
            for r in pack_sequences(docs, budget=20, tokens_col="ntok").collect()
        }
    finally:
        spark.conf.set(key, old)
    whole = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(docs, budget=20, tokens_col="ntok").collect()
    }
    assert chunked == whole
    import numpy as np

    counts = np.array([(i * 7) % 13 for i in range(100)], dtype=np.int64)
    want = {i: f"0-{p}" for i, p in enumerate(_pack_bounds(counts, 20))}
    assert whole == want


def test_pack_bounds_property_fuzz():
    """Hypothesis fuzz of the numpy pack-jump kernel against the
    python greedy reference — pure driver-side, no Spark session."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=30), max_size=60),
        st.integers(min_value=1, max_value=25),
    )
    def check(counts, budget):
        got = list(_pack_bounds(np.array(counts, dtype=np.int64), budget))
        assert got == _greedy_reference(counts, budget)
        # invariants independent of the reference
        if counts:
            assert got[0] == 0
            assert all(b - a in (0, 1) for a, b in zip(got, got[1:]))

    check()


def test_window_documents_exact_and_edges(spark):
    """Strided windows follow the HF overflow convention: starts every
    stride tokens, window-sized, truncated tail; empty/null docs emit
    one empty window; tokens are word_tokens-normalized."""
    from ocr_project_spark.operators.pack import window_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens
            (2, "a b c"),           # exactly one window (n <= window)
            (3, ""),                # empty -> one empty window
            (4, None),              # null  -> one empty window
        ],
        "doc_id long, text string",
    )
    rows = window_documents(docs, window=3, stride=2).collect()
    got = {(r.doc_id, r.win_id): (r.start, r.text, r.n_tokens) for r in rows}
    # doc 1: n=7, n_win = 1 + ceil((7-3)/2) = 3
    assert got[(1, 0)] == (0, "a b c", 3)
    assert got[(1, 1)] == (2, "c d e", 3)
    assert got[(1, 2)] == (4, "e f g", 3)
    assert (1, 3) not in got
    assert got[(2, 0)] == (0, "a b c", 3)
    assert got[(3, 0)] == (0, "", 0)
    assert got[(4, 0)] == (0, "", 0)


def test_window_documents_coverage_and_plan(spark):
    """Every token is covered (stride-stepped windows reconstruct the
    document), and the plan is shuffle-free — chunking is row-local."""
    import pyspark.sql.functions as F

    from ocr_project_spark.functions.text import word_tokens
    from ocr_project_spark.operators.pack import window_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    W, S = 20, 15
    out = window_documents(docs, window=W, stride=S)
    # reconstruction: concat each window's first S tokens (all of the
    # last window) in win_id order == the original token stream
    rebuilt = (
        out.withColumn("_toks", F.split(F.col("text"), " "))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("win_id", "_toks"))
                        ),
                        lambda s: F.when(
                            s["win_id"]
                            == F.size(F.collect_list("win_id")) - 1,
                            s["_toks"],
                        ).otherwise(F.slice(s["_toks"], 1, S)),
                    )
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    orig = docs.select(
        "doc_id", F.array_join(word_tokens(F.col("text")), " ").alias("orig")
    )
    # window semantics guarantee full coverage; compare normalized text
    joined = rebuilt.join(orig, "doc_id")
    bad = joined.where(F.col("rebuilt") != F.col("orig")).count()
    assert bad == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
