"""Duplicate clustering: distributed connected components vs a python
union-find oracle (operators/dedup.py duplicate_clusters)."""

from __future__ import annotations

from ocr_project_spark.operators.dedup import (
    duplicate_clusters,
    elect_keepers,
    simhash_pairs,
)


def union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def canon(assign):
    """cluster membership as frozensets (labels are arbitrary)."""
    groups = {}
    for node, c in assign.items():
        groups.setdefault(c, set()).add(node)
    return {frozenset(v) for v in groups.values()}


def test_clusters_chain_cliques_isolated(spark):
    pairs = [(1, 2), (2, 3), (3, 4),        # chain of 4
             (10, 11), (11, 12), (10, 12),  # triangle
             (20, 21)]                      # isolated pair
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in duplicate_clusters(df).collect()}
    exp = union_find(pairs)
    assert canon(got) == canon(exp)
    # min-label convention: cluster id is the min member
    assert all(c == min(m for m, cc in got.items() if cc == c) for c in set(got.values()))

    keepers = {r["cluster_id"]: (r["keeper_id"], r["n_members"])
               for r in elect_keepers(duplicate_clusters(df)).collect()}
    assert keepers[1] == (1, 4)
    assert keepers[10] == (10, 3)
    assert keepers[20] == (20, 2)


def test_clusters_on_simhash_pairs(spark, corpus_dfs):
    docs_df, _ = corpus_dfs
    flat = docs_df.selectExpr("doc_id as id", "cast(doc_id as string) as text")
    # real near-dup pairs from the fixture corpus via simhash banding
    pairs = simhash_pairs(
        docs_df.selectExpr(
            "doc_id",
            "array_join(transform(spans, s -> coalesce(s.text, '')), ' ') as text",
        ),
        bands=4, max_hamming=2,
    ).select("id_a", "id_b")
    rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    if not rows:
        return  # corpus produced no near-dups at this threshold
    got = {r["id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert canon(got) == canon(union_find(rows))


def test_simhash64_band_fanout_bounded(spark):
    """The 64-bit/8-band default must keep band buckets corpus-scale:
    with 256 values per band, bucket sizes stay near n/256 — unlike the
    16-bit/4-bit-band demo tier whose 16 values per band degenerate the
    bucket equi-join toward a cross join (the round-1 scale flaw)."""
    import random

    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import simhash_signature

    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    n = 2000
    docs = [(str(i), " ".join(rnd.sample(vocab, 30))) for i in range(n)]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    bits, bands = 64, 8
    rows = bits // bands
    sig = df.select(simhash_signature(F.col("text"), bits).alias("sig"))
    banded = sig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(F.col("sig"), b * rows + 1, rows).alias("bb"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("x")
    ).select("x.band", "x.bb")
    sizes = [r["c"] for r in banded.groupBy("band", "bb").agg(
        F.count(F.lit(1)).alias("c")).collect()]
    # candidate work within a bucket is ~size^2; bound the max bucket
    # far below anything cross-join-shaped (n/256 expected ~8)
    assert max(sizes) <= n * 0.05, max(sizes)
    # expected candidate fraction ~ bands/2^rows = 8/256 ~ 3% of n^2/2
    # (vs >= 25% for the 16-bit/4-bit-band tier); allow 2x for the
    # center-bias of simhash bit distributions
    cand_pairs = sum(s * (s - 1) // 2 for s in sizes)
    assert cand_pairs < (bands / 2**rows) * (n * n / 2) * 2, cand_pairs


def test_star_contraction_matches_union_find(spark):
    """Large-star/small-star CC: identical clusters to union-find, and
    convergence within O(log n) rounds — 8 rounds suffice for a
    200-node chain where min-label propagation would need ~200."""
    n = 200
    chain = [(f"{i:03d}", f"{i+1:03d}") for i in range(n - 1)]
    cliques = [("a00", x) for x in ("a01", "a02", "a03")]
    pairs = spark.createDataFrame(chain + cliques, "id_a string, id_b string")

    from ocr_project_spark.operators.dedup import duplicate_clusters_star

    got = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters_star(pairs, max_iterations=8).collect()
    }
    want = union_find(chain + cliques)
    assert canon(got) == canon(want)
    # every chain node labels to the chain minimum directly
    assert got["199"] == "000" and got["100"] == "000"
    assert got["a03"] == "a00"


def test_star_contraction_agrees_with_label_prop(spark, corpus_dfs):
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import (
        duplicate_clusters_star,
        simhash_pairs,
    )

    docs_df, _ = corpus_dfs
    pairs = simhash_pairs(
        docs_df.selectExpr(
            "doc_id",
            "array_join(transform(spans, s -> coalesce(s.text, '')), ' ') as text",
        ),
        bands=4, max_hamming=2,
    ).select("id_a", "id_b")
    if not pairs.take(1):
        return
    a = {r["id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    b = {r["id"]: r["cluster_id"]
         for r in duplicate_clusters_star(pairs).collect()}
    assert canon(a) == canon(b)


def test_signature_forms_identical(spark, corpus_dfs):
    """The DataFrame-level (explode + partial-agg) signature paths must
    be value-identical to the Column-expression forms they accelerate."""
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
        simhash_signature,
        simhash_signatures,
    )

    docs_df, _ = corpus_dfs
    flat = docs_df.select(
        "doc_id",
        F.array_join(
            F.transform(F.coalesce(F.col("spans"), F.array()),
                        lambda s: F.coalesce(s["text"], F.lit(""))),
            " ",
        ).alias("text"),
    # cap text length: the Column form's interpreted nested-HOF cost on
    # the 400-span mega-doc alone is minutes (exactly why the df form
    # exists); short docs still cover empty/edge token sets
    ).where(F.length("text") < 1500)

    col_sim = {
        r["doc_id"]: r["s"]
        for r in flat.select(
            "doc_id", simhash_signature(F.col("text"), 64).alias("s")
        ).collect()
    }
    df_sim = {
        r["id"]: r["sig"] for r in simhash_signatures(flat, bits=64).collect()
    }
    assert col_sim == df_sim

    col_mh = {
        r["doc_id"]: tuple(r["s"])
        for r in flat.select(
            "doc_id", minhash_signature(F.col("text"), 3, 16).alias("s")
        ).collect()
    }
    df_mh = {
        r["id"]: tuple(r["sig"])
        for r in minhash_signatures(flat, n=3, k=16).collect()
    }
    assert col_mh == df_mh


def test_simhash_clusters_match_naive_pair_path(spark, corpus_dfs):
    """simhash_clusters (identical-signature collapse + rep-only band
    join) must produce exactly the clusters of the naive
    pairs-then-cluster path — at distinct-sig join cost."""
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import (
        simhash_clusters,
        simhash_pairs,
    )

    docs_df, _ = corpus_dfs
    flat = docs_df.select(
        "doc_id",
        F.array_join(
            F.transform(F.coalesce(F.col("spans"), F.array()),
                        lambda s: F.coalesce(s["text"], F.lit(""))),
            " ",
        ).alias("text"),
    )
    naive_pairs = simhash_pairs(flat, bands=8, max_hamming=3).select(
        "id_a", "id_b"
    )
    rows = [(r["id_a"], r["id_b"]) for r in naive_pairs.collect()]
    assert rows, "fixture corpus should contain simhash near-dups"
    want = union_find(rows)
    got = {
        r["id"]: r["cluster_id"]
        for r in simhash_clusters(flat, bands=8, max_hamming=3).collect()
    }
    assert canon(got) == canon(want)


def test_hamming_forms_identical(spark):
    """XOR+popcount word hamming == the readable substring-compare
    form, across random 64-bit signatures (incl. identical pairs)."""
    import random

    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import (
        hamming_expr,
        hamming_words_expr,
    )

    rnd = random.Random(3)
    rows = []
    for _ in range(300):
        a = "".join(rnd.choice("01") for _ in range(64))
        if rnd.random() < 0.2:
            b = a
        else:
            b = "".join(rnd.choice("01") for _ in range(64))
        rows.append((a, b))
    df = spark.createDataFrame(rows, "a string, b string")
    out = df.select(
        hamming_expr(F.col("a"), F.col("b"), 64).alias("h1"),
        hamming_words_expr(F.col("a"), F.col("b"), 64).alias("h2"),
    ).collect()
    assert all(r["h1"] == r["h2"] for r in out)


def test_simhash_forms_agree_on_null_and_empty_text(spark):
    """Column form (simhash_signature) and DataFrame form
    (simhash_signatures) must stay bit-for-bit identical on degenerate
    inputs: null text and empty text both tokenize to the empty set
    (word_tokens coalesces), yielding the all-'1' zero-vote signature
    in BOTH forms."""
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import (
        simhash_signature,
        simhash_signatures,
    )

    df = spark.createDataFrame(
        [("a", None), ("b", ""), ("c", "   "), ("d", "hello world")],
        "doc_id string, text string",
    )
    for bits in (16, 64):
        col_form = {
            r["doc_id"]: r["sig"]
            for r in df.select(
                "doc_id", simhash_signature(F.col("text"), bits).alias("sig")
            ).collect()
        }
        df_form = {
            r["id"]: r["sig"]
            for r in simhash_signatures(df, "doc_id", "text", bits=bits).collect()
        }
        assert col_form == df_form
        assert col_form["a"] == col_form["b"] == "1" * bits


def test_minhash_clusters_match_naive_pair_path(spark, corpus_dfs):
    """minhash_clusters (identical-signature collapse + rep-only band
    join, the MinHash counterpart of simhash_clusters' hot-bucket
    guard) must produce exactly the clusters of the naive
    minhash_lsh_pairs-then-cluster path."""
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import (
        minhash_clusters,
        minhash_lsh_pairs,
    )

    docs_df, _ = corpus_dfs
    flat = docs_df.select(
        "doc_id",
        F.array_join(
            F.transform(F.coalesce(F.col("spans"), F.array()),
                        lambda s: F.coalesce(s["text"], F.lit(""))),
            " ",
        ).alias("text"),
    )
    naive_pairs = minhash_lsh_pairs(flat, n=3, k=16, bands=8)
    rows = [(r["id_a"], r["id_b"]) for r in naive_pairs.collect()]
    assert rows, "fixture corpus should contain minhash near-dups"
    want = union_find(rows)
    got = {
        r["id"]: r["cluster_id"]
        for r in minhash_clusters(flat, n=3, k=16, bands=8).collect()
    }
    assert canon(got) == canon(want)


def test_duplicate_passages_hand_corpus(spark):
    """Exact-substring tier: a 5-gram shared by two docs is flagged
    with the right witness ids; unique passages and sub-threshold
    shingles are not."""
    from ocr_project_spark.operators.dedup import duplicate_passages

    shared = "alpha beta gamma delta epsilon"
    rows = [
        ("d1", f"intro one two {shared} outro"),
        ("d2", f"{shared} something entirely different here"),
        ("d3", "no overlap with anything else at all truly"),
        ("d4", "tiny"),                       # < n tokens -> whole-text shingle
        ("d5", "tiny"),                       # duplicate whole-text passage
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["passage"]: (r["n_docs"], r["min_doc_id"], r["max_doc_id"])
        for r in duplicate_passages(df, n=5, min_docs=2).collect()
    }
    assert got[shared] == (2, "d1", "d2")
    assert got["tiny"] == (2, "d4", "d5")
    assert all(p == shared or p == "tiny" for p in got)


def _flat_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_hand_scenario(spark):
    """Two-batch admission over a hand corpus: in-batch dup clusters
    keep their min id; a later batch's near-dup of a stored doc is
    rejected; unique docs always pass."""
    from ocr_project_spark.operators.dedup import minhash_dedup_incremental

    t_dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    t_unique1 = "one two three four five six seven eight nine ten " * 3
    t_unique2 = "red orange yellow green blue indigo violet pink " * 3
    t_unique3 = "north south east west up down left right forward " * 3
    batch1 = _flat_docs(spark, [
        (1, t_dup), (2, t_dup),          # in-batch dup pair -> keep 1
        (3, t_unique1),                   # unique -> keep
    ])
    admitted1, store1 = minhash_dedup_incremental(batch1, None)
    assert {r["id"] for r in admitted1.collect()} == {1, 3}
    assert {r["id"] for r in store1.collect()} == {1, 3}  # admitted-only

    batch2 = _flat_docs(spark, [
        (10, t_dup),                      # dup of stored doc 1 -> reject
        (11, t_unique2), (12, t_unique2), # new in-batch pair -> keep 11
        (13, t_unique3),                  # unique -> keep
    ])
    admitted2, store2 = minhash_dedup_incremental(batch2, store1)
    assert {r["id"] for r in admitted2.collect()} == {11, 13}
    assert {r["id"] for r in store2.collect()} == {1, 3, 11, 13}


def test_incremental_dedup_store_policies(spark):
    """'all' policy also rejects near-dups of previously REJECTED docs;
    'admitted' only guards the retained corpus."""
    from ocr_project_spark.operators.dedup import minhash_dedup_incremental

    t_a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    t_b = "one two three four five six seven eight nine ten " * 3
    # batch1: 1 and 2 duplicate each other; 2 is rejected
    batch1 = _flat_docs(spark, [(1, t_a), (2, t_a)])
    # batch2: 20 duplicates the REJECTED doc 2 (same text)
    batch2 = _flat_docs(spark, [(20, t_a), (21, t_b)])

    _, store_adm = minhash_dedup_incremental(batch1, None,
                                             store_policy="admitted")
    adm2, _ = minhash_dedup_incremental(batch2, store_adm,
                                        store_policy="admitted")
    # identical text also collides with ADMITTED doc 1 -> rejected
    assert {r["id"] for r in adm2.collect()} == {21}

    _, store_all = minhash_dedup_incremental(batch1, None,
                                             store_policy="all")
    assert {r["id"] for r in store_all.collect()} == {1, 2}
    adm2b, _ = minhash_dedup_incremental(batch2, store_all,
                                         store_policy="all")
    assert {r["id"] for r in adm2b.collect()} == {21}


def test_incremental_dedup_invariants_on_corpus(spark):
    """Corpus invariants over a two-batch split of the documents table:
    (1) the admitted set is pairwise band-collision-free across
    batches under 'all' policy, (2) every rejected doc collides with
    some seen doc, (3) admitted+rejected partition the input."""
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import (
        _minhash_banded,
        minhash_dedup_incremental,
        minhash_signatures,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)

    adm1, store1 = minhash_dedup_incremental(b1, None, store_policy="all")
    adm2, store2 = minhash_dedup_incremental(b2, store1, store_policy="all")
    admitted = {r["id"] for r in adm1.collect()} | {
        r["id"] for r in adm2.collect()
    }
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert admitted <= all_ids
    assert {r["id"] for r in store2.collect()} == all_ids  # 'all' stores everything

    # (1) no two admitted docs share a band bucket
    sig = minhash_signatures(docs)
    banded = _minhash_banded(sig, k=16, bands=4)
    adm_df = spark.createDataFrame([(i,) for i in admitted], "id long")
    ab = banded.join(adm_df, "id", "left_semi")
    x, y = ab.alias("x"), ab.alias("y")
    coll = (
        x.join(y, ["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .count()
    )
    assert coll == 0

    # (2) every rejected doc band-collides with at least one other doc
    rejected = all_ids - admitted
    assert rejected  # the synthetic corpus contains duplicates
    bx, by = banded.alias("bx"), banded.alias("by")
    colliding_ids = {
        r["id"]
        for r in bx.join(by, ["band", "bucket"])
        .where(F.col("bx.id") != F.col("by.id"))
        .select(F.col("bx.id").alias("id"))
        .distinct()
        .collect()
    }
    assert rejected <= colliding_ids


def test_simhash_incremental_dedup_hand_scenario(spark):
    """SimHash incremental admission mirrors the MinHash tier: in-batch
    dup clusters keep min id, store collisions reject, uniques pass —
    with hamming-verified collisions."""
    from ocr_project_spark.operators.dedup import simhash_dedup_incremental

    t_dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    t_u1 = "one two three four five six seven eight nine ten " * 3
    t_u2 = "red orange yellow green blue indigo violet pink " * 3
    batch1 = _flat_docs(spark, [(1, t_dup), (2, t_dup), (3, t_u1)])
    adm1, store1 = simhash_dedup_incremental(batch1, None)
    assert {r["id"] for r in adm1.collect()} == {1, 3}
    assert {r["id"] for r in store1.collect()} == {1, 3}

    batch2 = _flat_docs(spark, [(10, t_dup), (11, t_u2), (12, t_u2)])
    adm2, store2 = simhash_dedup_incremental(batch2, store1)
    assert {r["id"] for r in adm2.collect()} == {11}
    assert {r["id"] for r in store2.collect()} == {1, 3, 11}


def test_simhash_incremental_corpus_invariants(spark):
    """Corpus invariants for the SimHash tier over a two-batch split
    ('all' policy): (1) no two ADMITTED docs are banded near-dups
    (shared band AND hamming <= max_hamming), (2) every REJECTED doc
    has a banded near-dup witness among the corpus, (3) the store
    records every seen doc."""
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.dedup import (
        _simhash_banded,
        hamming_words_expr,
        simhash_dedup_incremental,
        simhash_signatures,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    adm1, store1 = simhash_dedup_incremental(b1, None, store_policy="all")
    adm2, store2 = simhash_dedup_incremental(b2, store1, store_policy="all")
    all_ids = {r["doc_id"] for r in docs.collect()}
    admitted = {r["id"] for r in adm1.collect()} | {
        r["id"] for r in adm2.collect()
    }
    assert admitted <= all_ids and admitted
    assert {r["id"] for r in store2.collect()} == all_ids
    rejected = all_ids - admitted
    assert rejected  # the synthetic corpus contains near-dups

    banded = _simhash_banded(
        simhash_signatures(docs).select(F.col("id"), "sig"), bits=64, bands=8
    )
    x, y = banded.alias("x"), banded.alias("y")
    collisions = (
        x.join(y, ["band", "bb"])
        .where(F.col("x.id") != F.col("y.id"))
        .where(
            hamming_words_expr(F.col("x.sig"), F.col("y.sig"), 64) <= 3
        )
        .select(F.col("x.id").alias("id"), F.col("y.id").alias("other"))
        .distinct()
    )
    adm_df = spark.createDataFrame([(i,) for i in admitted], "id long")
    # (1) admitted docs are pairwise non-near-dup
    both_admitted = (
        collisions.join(adm_df, "id", "left_semi")
        .join(adm_df.select(F.col("id").alias("other")), "other", "left_semi")
        .count()
    )
    assert both_admitted == 0
    # (2) every rejected doc has a near-dup witness
    colliding_ids = {r["id"] for r in collisions.select("id").distinct().collect()}
    assert rejected <= colliding_ids


# ------------------------------------------------------ scrub_passages
def test_scrub_passages_witness_and_removal(spark):
    from ocr_project_spark.operators.dedup import scrub_passages

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon unique one"),
            (2, "intro words alpha beta gamma delta epsilon outro"),
            (3, "totally different text with no repeats at all here"),
            (4, "tiny"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_passages(docs, n=5, min_docs=2).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # witness (min id) keeps the passage; the other doc loses exactly
    # the 5 covered tokens
    assert got[1].clean_text == "alpha beta gamma delta epsilon unique one"
    assert got[2].clean_text == "intro words outro"
    assert (got[2].n_tokens_in, got[2].n_tokens_kept) == (8, 3)
    # untouched docs pass through; <n-token and null docs survive
    assert got[3].n_tokens_kept == got[3].n_tokens_in == 9
    assert got[4].clean_text == "tiny"
    assert got[5].clean_text == "" and got[5].n_tokens_in == 0


def test_scrub_passages_overlaps_merge_and_keep_first_off(spark):
    from ocr_project_spark.operators.dedup import scrub_passages

    # two overlapping duplicated trigrams in doc 2 ("a b c" and
    # "b c d") must scrub as one 4-token span
    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "q a b c d r"),
            (3, "b c d m n o"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.clean_text for r in scrub_passages(docs, n=3).collect()}
    assert got[1] == "a b c x y z"       # witness of "a b c"
    # doc 2 is the non-witness of "a b c" (loses a, b, c) but the
    # min-id WITNESS of "b c d" — yet b and c are already covered by
    # the blocked "a b c" window, so only d survives of that passage
    assert got[2] == "q d r"
    assert got[3] == "m n o"             # non-witness of "b c d"

    allscrub = {
        r.doc_id: r.clean_text
        for r in scrub_passages(docs, n=3, keep_first=False).collect()
    }
    # no witness: every occurrence of both flagged trigrams is cut,
    # and doc 2's overlapping spans merge into one a..d removal
    assert allscrub[1] == "x y z"
    assert allscrub[2] == "q r"
    assert allscrub[3] == "m n o"


def test_scrub_passages_broadcast_artifacts_identical(spark):
    """broadcast_artifacts=True must be a pure plan change: identical
    output on the real sf0.001 corpus (incl. the witness convention
    and the null-id doc), and the token arrays must no longer cross an
    exchange — the rebuild join becomes a broadcast hash join."""
    from ocr_project_spark.operators.dedup import scrub_passages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = scrub_passages(docs, n=5, min_docs=2)
    bcast = scrub_passages(docs, n=5, min_docs=2, broadcast_artifacts=True)
    assert base.exceptAll(bcast).count() == 0
    assert bcast.exceptAll(base).count() == 0
    # at sf0.001 the static planner broadcasts both joins on size
    # estimates alone; emulate the at-scale planner state (estimates
    # past the threshold -> SMJ) by disabling auto-broadcast: the
    # hint must still produce broadcast joins, the un-hinted plan must
    # degrade to shuffle joins with more exchanges
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = scrub_passages(
            docs, n=5, min_docs=2, broadcast_artifacts=True
        )._jdf.queryExecution().executedPlan().toString()
        base_plan = scrub_passages(
            docs, n=5, min_docs=2
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "SortMergeJoin" in base_plan
    # only the global flag aggregate (and the starts aggregate over
    # the small blocked subset) still exchange
    assert plan.count("Exchange hashpartitioning") < base_plan.count(
        "Exchange hashpartitioning"
    )


def test_scrub_passages_matches_flag_accounting(spark):
    """Every token removed corresponds to coverage by a flagged
    passage on the real sf0.001 corpus; docs flagged nowhere are
    untouched."""
    import pyspark.sql.functions as F

    from ocr_project_spark.operators.dedup import (
        duplicate_passages,
        scrub_passages,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = scrub_passages(docs, n=5, min_docs=2)
    flagged = duplicate_passages(docs, n=5, min_docs=2)
    n_flagged = flagged.count()
    assert n_flagged > 0
    removed = out.where(F.col("n_tokens_kept") < F.col("n_tokens_in"))
    assert removed.count() > 0
    assert out.count() == docs.count()
    # accounting: never gains tokens, and clean_text's token count is
    # exactly n_tokens_kept on every row
    assert out.where(F.col("n_tokens_kept") > F.col("n_tokens_in")).count() == 0
    from ocr_project_spark.functions.text import word_tokens

    bad = out.where(
        F.size(word_tokens(F.col("clean_text"))) != F.col("n_tokens_kept")
    )
    assert bad.count() == 0


def test_scrub_passages_null_id_doc_still_scrubbed(spark):
    from ocr_project_spark.operators.dedup import scrub_passages

    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (None, "q a b c d r"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.clean_text for r in scrub_passages(docs, n=3).collect()}
    # doc 1 is the witness (min non-null id); the null-id doc must not
    # be exempted from the scrub by a null != comparison
    assert got[1] == "a b c x y z"
    assert got[None] == "q d r"


def test_scrub_passages_all_duplicate_doc_linear(spark):
    """The gap-merge rebuild's worst case: a document that is ~all
    duplicated passages (every window blocked, blocked-start count ~=
    token count).  The old exists() rebuild was O(tokens^2/n) here;
    the gap-merge pass is linear, and the output must be a full scrub
    for every non-witness copy.  5k tokens x 3 docs completes in
    seconds; the quadratic form took minutes at 10x this size."""
    from ocr_project_spark.operators.dedup import scrub_passages

    body = " ".join(f"w{i % 97}" for i in range(5000))  # 5k tokens
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, "pre " + body + " post")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_passages(docs, n=5, min_docs=2).collect()}
    assert got[1].clean_text == body                     # witness keeps all
    assert got[2].clean_text == "" and got[2].n_tokens_kept == 0
    # doc 3: every interior window of the shared body is blocked; only
    # the tokens not covered by any flagged 5-gram survive.  "pre"
    # shifts the windows, so windows containing "pre"/"post" are
    # unflagged — coverage starts at the first all-shared window.
    assert got[3].n_tokens_kept < 12
    assert got[3].clean_text.startswith("pre")
    assert got[3].clean_text.endswith("post")
