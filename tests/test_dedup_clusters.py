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
