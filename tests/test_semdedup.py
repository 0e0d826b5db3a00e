"""SemDeDup tier (operators/similarity.py semdedup): hand-scenario
keep semantics, brute-force equivalence of the identical-collapse
path, k-means codebook tier, and corpus invariants on the sf0.001
embeddings parquet.  The fixed-codebook tier is additionally
oracle-checked vs DuckDB (harness LOCAL query ``semdedup``)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ocr_project_spark.operators.similarity import (
    assign_centroids,
    cosine_expr,
    semdedup,
)

DIM = 8


def _vec(i: int, eps: float = 0.0) -> list[float]:
    v = [0.0] * DIM
    v[i] = math.sqrt(1 - eps * eps)
    v[(i + 1) % DIM] = eps
    return v


# Two orthogonal centroids: e_0 and e_2.
CENTS = [_vec(0), _vec(2)]


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_hand_scenario_keep_flags(spark):
    # cluster 0: 1 and 3 identical (collapse), 5 near 1 (dominated),
    #            7 far from both (kept: cos(e_0, nudged-toward-e_1
    #            slightly) still >= ... use an orthogonal-ish vector)
    # cluster 1: 2 alone (kept), 9 near 2 (dominated).
    near0 = _vec(0, eps=0.1)  # cos to _vec(0) ~ 0.995
    far0 = [0.7, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.714]  # cluster 0, low sim
    near2 = _vec(2, eps=0.1)
    rows = [
        (1, _vec(0)),
        (3, _vec(0)),
        (5, near0),
        (7, far0),
        (2, _vec(2)),
        (9, near2),
    ]
    out = semdedup(
        _emb_df(spark, rows), centroids=CENTS, threshold=0.95
    ).collect()
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in out}
    assert len(out) == len(rows)  # one row per input, members included
    assert got[1] == (0, True)  # min-id of the identical group
    assert got[3] == (0, False)  # identical member, collapsed + dropped
    assert got[5] == (0, False)  # near-dup of 1, dominated
    assert got[7][0] == 0 and got[7][1]  # same cluster, below threshold
    assert got[2] == (1, True)
    assert got[9] == (1, False)


def test_cross_cluster_never_dominates(spark):
    # 4 and 6 are near-identical but straddle the centroid boundary:
    # domination is strictly within-cluster, so both survive.
    a = [1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    b = [1.0, 0.0, 1.0001, 0.0, 0.0, 0.0, 0.0, 0.0]
    out = semdedup(
        _emb_df(spark, [(4, a), (6, b)]), centroids=CENTS, threshold=0.9
    ).collect()
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in out}
    assert got[4][0] != got[6][0]
    assert got[4][1] and got[6][1]


def test_zero_vector_lands_cluster0_and_collapses(spark):
    rows = [(0, [0.0] * DIM), (8, [0.0] * DIM), (2, _vec(2))]
    out = semdedup(
        _emb_df(spark, rows), centroids=CENTS, threshold=0.95
    ).collect()
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in out}
    assert got[0] == (0, True)  # cosine-0 everywhere -> cluster 0, kept
    assert got[8] == (0, False)  # identical copy collapses to min-id 0
    assert got[2] == (1, True)


def test_collapse_path_matches_bruteforce(spark):
    """keep flags == the uncollapsed definition: dropped iff a
    smaller-id same-cluster vector has cosine >= threshold."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("vec_id") < 200)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    out = semdedup(emb, centroids=cents, threshold=0.35)
    asg = assign_centroids(emb, cents, vec_col="embedding").select(
        "vec_id", "embedding", "cluster"
    )
    a, b = asg.alias("a"), asg.alias("b")
    dominated = {
        r["vec_id"]
        for r in a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") > F.col("b.vec_id")),
        )
        .where(
            cosine_expr(F.col("a.embedding"), F.col("b.embedding"))
            >= F.lit(0.35)
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .collect()
    }
    for r in out.collect():
        assert r["keep"] == (r["vec_id"] not in dominated), r


def test_kmeans_codebook_tier(spark):
    """centroids=None: the Spark-ML k-means tier — one row per vector,
    clusters in range, keepers are cluster-wise min-id-consistent."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).where(F.col("vec_id") < 300)
    n = emb.count()
    out = semdedup(emb, n_clusters=6, threshold=0.35, seed=7)
    rows = out.collect()
    assert len(rows) == n
    assert {r["vec_id"] for r in rows} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    assert all(0 <= r["cluster"] < 6 for r in rows)
    # determinism: fixed seed -> identical result on a second run
    again = {(r["vec_id"], r["cluster"], r["keep"]) for r in out.collect()}
    assert {(r["vec_id"], r["cluster"], r["keep"]) for r in rows} == again
