"""Embedding near-dup LSH tier + incremental admission: subset/
precision contracts vs the brute-force oracle form, hand-scenario
admission, and corpus invariants on the sf0.001 embeddings parquet."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ocr_project_spark.operators.similarity import (
    _hyperplane_banded,
    cosine_dup_pairs,
    cosine_dup_pairs_lsh,
    cosine_expr,
    embedding_dedup_incremental,
    random_planes,
)

DIM = 64
PLANES = random_planes(16, DIM, seed=7)


def _vec(i: int, eps: float = 0.0) -> list[float]:
    """Unit basis vector e_i, optionally nudged toward e_{i+1}."""
    v = [0.0] * DIM
    v[i] = math.sqrt(1 - eps * eps)
    v[(i + 1) % DIM] = eps
    return v


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_lsh_pairs_subset_of_bruteforce(emb, spark):
    brute = {
        (r["id_a"], r["id_b"])
        for r in cosine_dup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_dup_pairs_lsh(
            emb, threshold=0.4, planes=PLANES, bands=8
        ).collect()
    }
    assert brute  # 66 true pairs at 0.4 on this corpus
    assert lsh  # 16 planes / 8 bands: ~98% per-pair recall
    assert lsh <= brute  # precision is exact (verified cosine)


def test_incremental_hand_scenario(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    b1 = mk([(1, _vec(0)), (2, _vec(0, eps=0.05)), (5, _vec(10))])
    adm1, store1 = embedding_dedup_incremental(
        b1, None, threshold=0.9, planes=PLANES
    )
    # in-batch cluster {1, 2} (cosine ~0.9987) elects min id; 5 is alone
    assert {r["id"] for r in adm1.collect()} == {1, 5}
    assert {r["id"] for r in store1.collect()} == {1, 5}

    b2 = mk([(11, _vec(0, eps=0.02)), (13, _vec(10, eps=0.03)), (20, _vec(30))])
    adm2, store2 = embedding_dedup_incremental(
        b2, store1, threshold=0.9, planes=PLANES, store_policy="all"
    )
    # 11 collides with stored 1, 13 with stored 5; 20 is new
    assert {r["id"] for r in adm2.collect()} == {20}
    assert {r["id"] for r in store2.collect()} == {1, 5, 11, 13, 20}


def test_incremental_store_policy_admitted(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    b = mk([(1, _vec(0)), (2, _vec(0, eps=0.05)), (5, _vec(10))])
    _, store = embedding_dedup_incremental(b, None, threshold=0.9, planes=PLANES)
    assert {r["id"] for r in store.collect()} == {1, 5}  # rejected 2 not stored


def test_incremental_corpus_invariants(emb, spark):
    """Two-batch split over real embeddings ('all' policy): (1) no two
    ADMITTED vectors are LSH-banded verified near-dups, (2) every
    REJECTED vector has a banded verified witness, (3) the store
    records every seen vector."""
    b1 = emb.where(F.col("vec_id") % 2 == 0)
    b2 = emb.where(F.col("vec_id") % 2 == 1)
    adm1, s1 = embedding_dedup_incremental(
        b1, None, threshold=0.4, planes=PLANES, store_policy="all"
    )
    adm2, s2 = embedding_dedup_incremental(
        b2, s1, threshold=0.4, planes=PLANES, store_policy="all"
    )
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    admitted = {r["id"] for r in adm1.collect()} | {r["id"] for r in adm2.collect()}
    assert admitted and admitted <= all_ids
    assert {r["id"] for r in s2.collect()} == all_ids
    rejected = all_ids - admitted
    assert rejected  # 66 true pairs at 0.4 -> some rejections

    banded = _hyperplane_banded(emb, PLANES, 4, "vec_id", "embedding")
    x, y = banded.alias("x"), banded.alias("y")
    collisions = (
        x.join(y, ["band", "bb"])
        .where(F.col("x.id") != F.col("y.id"))
        .where(cosine_expr(F.col("x.v"), F.col("y.v")) >= F.lit(0.4))
        .select(F.col("x.id").alias("id"), F.col("y.id").alias("other"))
        .distinct()
    )
    adm_df = spark.createDataFrame([(i,) for i in admitted], "id long")
    both = (
        collisions.join(adm_df, "id", "left_semi")
        .join(adm_df.select(F.col("id").alias("other")), "other", "left_semi")
        .count()
    )
    assert both == 0  # (1) admitted set pairwise collision-free
    colliding = {r["id"] for r in collisions.select("id").distinct().collect()}
    assert rejected <= colliding  # (2) every rejection has a witness


def test_identical_vector_batch_collapses(spark):
    """A copy-heavy batch (the hot-bucket case): all copies land in one
    cluster via star edges, the min id is admitted, and the rep-level
    band self-join never saw the copies (its input is one row here —
    pinned indirectly: N^2 collision rows would still yield the same
    admission, so also assert the collapse helper's rep count)."""
    from ocr_project_spark.operators.dedup import _collapse_identical

    rows = [(i, _vec(3)) for i in range(10, 20)] + [(1, _vec(40))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    adm, store = embedding_dedup_incremental(df, None, threshold=0.9, planes=PLANES)
    assert {r["id"] for r in adm.collect()} == {1, 10}
    assert {r["id"] for r in store.collect()} == {1, 10}
    vecs = df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    reps, edges = _collapse_identical(
        vecs.select("id", F.col("v").alias("sig")), F.col("sig")
    )
    assert reps.count() == 2  # 10 copies -> 1 rep (+ the lone vector)
    assert edges.count() == 9  # star edges, not 45 pairwise rows


def test_bad_store_policy_raises(spark):
    df = spark.createDataFrame([(1, _vec(0))], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        embedding_dedup_incremental(df, None, store_policy="sometimes")


def test_zero_vector_duplicates_rejected_across_batches(spark):
    """Identical all-zero vectors (cosine defined 0) must behave like
    every other identical vector: collapse in-batch AND reject against
    an identical stored copy — the store check short-circuits on
    vector equality, not only on cosine >= threshold."""
    z = [0.0, 0.0, 0.0, 0.0]
    b1 = spark.createDataFrame([(1, z)], "vec_id long, embedding array<double>")
    adm1, store = embedding_dedup_incremental(b1, None, threshold=0.9, planes=PLANES)
    assert {r["id"] for r in adm1.collect()} == {1}
    b2 = spark.createDataFrame(
        [(2, z), (3, z)], "vec_id long, embedding array<double>"
    )
    adm2, store2 = embedding_dedup_incremental(
        b2, store, threshold=0.9, planes=PLANES
    )
    assert adm2.count() == 0        # both are exact dups of the stored copy
    assert store2.count() == 1      # store does not accumulate zero copies
