"""Similarity search over embedding columns (array<float>).

Added per the training-data-pipeline mandate.  Two tiers:

  brute-force cosine top-k   exact baseline: broadcast the query
                             vector(s), one pass, JVM-side dot product
                             via F.aggregate/zip_with — no shuffle for
                             a single query, one topK for k results.
  LSH-bucketed ANN           random-hyperplane signatures -> bucket
                             equi-join; at 100 TB only bucketed
                             candidates are compared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_project_spark import caching


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    The query is a plan literal (broadcast by construction); ordering
    ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature against fixed hyperplanes -> bit string."""
    bits = [
        F.when(dot_expr(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only vectors whose hyperplane signature
    matches the query's bucket are scored.  The scale path — the scan
    prunes to one bucket (a partition-pruned read when the table is
    bucket-partitioned on the signature)."""
    vec = F.col(vec_col).cast("array<double>")
    sig = hyperplane_signature(vec, planes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qsig_val = "".join(
        "1" if sum(a * b for a, b in zip(query_vec, p)) >= 0 else "0" for p in planes
    )
    return (
        df.select(F.col(id_col), vec.alias("v"), sig.alias("sig"))
        .where(F.col("sig") == F.lit(qsig_val))
        .select(F.col(id_col), cosine_expr(F.col("v"), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold).

    Exact all-pairs formulation — the verification oracle tier.  At
    100 TB scale the identical filter runs AFTER hyperplane-LSH bucket
    candidate generation (compose hyperplane_signature + a bucket
    equi-join exactly as dedup.simhash_pairs does); the brute-force
    form here is what the small-SF driver check can hash-compare.
    """
    e = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(threshold))
    )


def random_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for the LSH tiers (fixed
    seed: signatures must be stable across sessions so a persisted
    signature store stays valid)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [[float(x) for x in row] for row in rng.randn(n_planes, dim)]


def _default_planes(
    dfs: list[DataFrame], vec_col: str = "v", n_planes: int = 16
) -> list[list[float]]:
    """Seeded 16-plane default, dimension sniffed from the first
    NON-NULL vector across ``dfs`` (a null first row must not pick a
    wrong dimension: dimension-mismatched planes make every dot
    product NULL, every sign bit '0', and the banded join degenerate
    into a cross join).  The sniff is an eager driver-side job — pass
    ``planes`` explicitly to keep plan construction lazy.  If no
    non-null vector exists anywhere, a 1-dim placeholder keeps the
    (empty) plan buildable."""
    for df in dfs:
        row = (
            df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
        )
        if row is not None:
            return random_planes(n_planes, len(row[0]))
    return random_planes(n_planes, 1)


def _hyperplane_banded(
    df: DataFrame,
    planes: list[list[float]],
    bands: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, v, band, bb) banded hyperplane-signature keys: the sign-bit
    string split into ``bands`` substrings; a pair is a candidate when
    ANY band matches (the standard OR-amplified LSH construction).
    ``v`` rides along for the post-join exact cosine verification.
    Banding itself is dedup.banded_bitstring — the same helper the
    SimHash tiers use."""
    from ocr_project_spark.operators.dedup import banded_bitstring

    assert len(planes) % bands == 0, "len(planes) must divide into bands"
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("_sig", hyperplane_signature(F.col("v"), planes))
    return banded_bitstring(e, len(planes), bands, sig_col="_sig", carry=("v",))


def cosine_dup_pairs_lsh(
    df: DataFrame,
    threshold: float,
    planes: list[list[float]] | None = None,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH: bucket
    equi-join candidates, exact-cosine verified — the 100 TB shape the
    ``cosine_dup_pairs`` docstring promises (that brute-force form
    stays as the small-SF oracle tier).

    APPROXIMATE in recall: a true pair surfaces only if some band's
    sign bits all agree (probability (1 - theta/pi)^rows per band,
    OR-amplified over bands — Charikar 2002 / the standard LSH
    analysis).  Precision is exact: every emitted pair passed the
    cosine filter.  Candidates are therefore a SUBSET of
    cosine_dup_pairs(df, threshold) (pinned by pytest).
    """
    if planes is None:
        planes = _default_planes([df], vec_col)
    banded = _hyperplane_banded(df, planes, bands, id_col, vec_col)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bb"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(threshold))
        .distinct()
    )


def embedding_dedup_incremental(
    new_vecs: DataFrame,
    store: DataFrame | None = None,
    threshold: float = 0.9,
    planes: list[list[float]] | None = None,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    store_policy: str = "admitted",
) -> tuple[DataFrame, DataFrame]:
    """Batch-over-batch admission on embedding cosine — the fourth
    incremental tier (exact md5 / MinHash / SimHash live in
    operators/dedup.py and share the same admission tail).

    Admission semantics match the sibling tiers exactly (connected
    components, not pairwise): the batch's verified LSH collisions
    form a graph, any CLUSTER touching the store is rejected
    wholesale, each surviving cluster admits its min-id keeper, and
    non-colliding singles admit.  So a rejected vector's witness may
    itself have been rejected (a chain A~B, B~C rejects C even when
    cosine(A, C) < threshold) — the conservative behavior a dedup
    pass wants.  Returns (admitted ids, grown store); the store
    persists (id, v) rows — signatures are recomputed per call from
    the deterministic ``planes`` so the store schema never pins an
    LSH configuration.

    Identical vectors collapse to min-id representatives before the
    band self-join (the hot-bucket guard every tier carries): a batch
    of N copies costs N star edges, not N^2 collision rows.  Same
    recall caveat as cosine_dup_pairs_lsh: candidate generation is
    approximate (a missed band collision admits a true near-dup);
    precision is exact.  store_policy as in the dedup tiers:
    'admitted' stores only survivors, 'all' records every seen vector.
    """
    from ocr_project_spark.operators.dedup import (
        _collapse_identical,
        _incremental_admit,
    )

    if store_policy not in ("admitted", "all"):
        raise ValueError(f"unknown store_policy {store_policy!r}")
    if planes is None:
        planes = _default_planes(
            [new_vecs.select(F.col(vec_col).alias("v"))]
            + ([store] if store is not None else []),
        )
    vecs = new_vecs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # identical-vector collapse: reps carry one row per distinct
    # vector, members reconnect via star edges (cosine(v, v) = 1 >=
    # any threshold, so identical vectors are mutual near-dups by
    # construction — except the all-zero vector, whose cosine is
    # defined 0 here; treat its copies as identical dups all the same,
    # matching the SimHash tier where equal signatures always collapse)
    reps, member_edges = _collapse_identical(
        vecs.select("id", F.col("v").alias("sig")), F.col("sig")
    )
    reps = reps.select("id", F.col("sig").alias("v"))
    bn = _hyperplane_banded(reps, planes, bands, "id", "v")
    if store is not None:
        # IDENTICAL vectors verify as store duplicates unconditionally:
        # the in-batch collapse treats equal vectors as dups (star
        # edges), so the store check must agree or the all-zero vector
        # (cosine defined 0 here) would collapse in-batch yet re-admit
        # against an identical stored copy every batch.  The in-batch
        # rep_pairs join below needs no such arm: reps are one row per
        # DISTINCT vector, so two reps are never equal.
        bs = _hyperplane_banded(store, planes, bands, "id", "v")
        store_hits = (
            bn.alias("a")
            .join(bs.alias("b"), ["band", "bb"])
            .where(
                (cosine_expr(F.col("a.v"), F.col("b.v")) >= F.lit(threshold))
                | (F.col("a.v") == F.col("b.v"))
            )
            .select(F.col("a.id").alias("id"))
            .distinct()
        )
    else:
        store_hits = vecs.select("id").limit(0)
    a, b = bn.alias("a"), bn.alias("b")
    rep_pairs = (
        a.join(b, ["band", "bb"])
        .where(F.col("a.id") < F.col("b.id"))
        .where(cosine_expr(F.col("a.v"), F.col("b.v")) >= F.lit(threshold))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _incremental_admit(
        vecs, rep_pairs, member_edges, store_hits, store, store_policy
    )


def _partition_topk(scored: DataFrame, k: int) -> DataFrame:
    """NARROW per-partition partial top-k — the map-side-combine analog
    for per-group limits, which Catalyst cannot express: a groupBy
    (qid, partition_id) LOOKS map-side but its partial collect_list
    ships the un-sliced lists through the Exchange (the slice is a
    post-aggregate projection), so the shuffle still carries every
    scored row.  An Arrow-batched pandas kernel is a narrow
    transformation instead: zero shuffle, and each partition emits at
    most k rows per qid.  Memory is bounded by periodic compaction
    (buffer ~200k rows -> sort -> head(k) per qid).  Ordering matches
    the JVM tier exactly: cosine desc, id asc, stable."""
    import pandas as pd

    schema = scored.schema
    cols = scored.columns

    def fn(batches):
        frames: list = []
        size = 0

        def compact():
            nonlocal frames, size
            df = pd.concat(frames, ignore_index=True)
            df = df.sort_values(
                ["qid", "cosine", "id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            df = df.groupby("qid", sort=False, dropna=False).head(k)
            frames = [df]
            size = len(df)
            return df

        for pdf in batches:
            if len(pdf):
                frames.append(pdf[cols])
                size += len(pdf)
                if size > 200_000:
                    compact()
        if frames:
            yield compact()

    return scored.mapInPandas(fn, schema)


def _topk_per_query(
    scored: DataFrame, k: int, two_phase: bool = True
) -> DataFrame:
    """(qid, id, cosine) -> the k best rows per qid (cosine desc, id
    asc ties).

    Two-phase shape: the narrow _partition_topk kernel first, so the
    one real shuffle (groupBy qid) carries at most k rows per query
    per upstream partition instead of the whole scored corpus — at
    100 TB that is the difference between shuffling every (query,
    corpus) score onto one reducer per query (a plain window's shape,
    maximally skewed) and shuffling k * P small rows.  The final
    top-k is JVM-side: sort_array over a collect_list bounded at
    k * P elements per query, sliced to k.
    """
    if two_phase:
        scored = _partition_topk(scored, k)
    key = F.struct((-F.col("cosine")).alias("nc"), F.col("id").alias("id"))
    final = scored.groupBy("qid").agg(
        F.slice(F.sort_array(F.collect_list(key)), 1, k).alias("top")
    )
    return final.select("qid", F.explode("top").alias("x")).select(
        "qid", F.col("x.id").alias("id"), (-F.col("x.nc")).alias("cosine")
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "qid",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact batch k-NN join: for every query row, the k corpus rows
    with highest cosine (ties by corpus id) -> (qid, id, cosine).

    The retrieval primitive of a training-data pipeline (embedding
    retrieval / contamination checks: reference engine ships no
    vector ops; this extends the corpus-side similarity tier).  Plan
    shape: broadcast(queries) x corpus keeps the big side unshuffled
    (one map-side stage scores everything), then _topk_per_query's
    partial top-k bounds the shuffle at k rows per (query, partition).
    Exact and O(|Q| * |C|) scoring by construction — the verification
    tier; use knn_join_lsh when |Q| * |C| is out of reach.
    """
    q = queries.select(
        F.col(q_id).alias("qid"), F.col(q_vec).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(c_id).alias("id"), F.col(c_vec).cast("array<double>").alias("v")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "qid", "id", cosine_expr(F.col("qv"), F.col("v")).alias("cosine")
    )
    return _topk_per_query(scored, k)


def knn_join_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    planes: list[list[float]] | None = None,
    bands: int = 8,
    q_id: str = "qid",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate batch k-NN join: hyperplane-LSH banded candidate
    generation (any shared band bucket) + exact cosine on candidates +
    per-query top-k.  Same output schema as knn_join; every returned
    row IS a true (query, corpus) cosine — only RECALL is approximate
    (a neighbor sharing no band bucket is missed; queries with no
    collision at all return no rows).

    Scale path when |Q| is itself corpus-sized: both sides shuffle on
    (band, bucket) — sum of bucket-pair products, not |Q| * |C|.
    Band width is the recall/cost dial: r = planes/bands bits per band
    gives 2^r bucket values (join selectivity) and candidate recall
    ~ 1-(1-s^r)^bands for pair similarity s.  The DEFAULT is
    24 planes / 8 bands (3 bits -> 8 values per band), which measures
    top-5 recall 0.9 on the synthetic corpus — retrieval callers get
    recall out of the box (tests/test_knn_join.py::
    test_lsh_recall_floor_on_defaults).  The selective dup-pair tier
    (embedding_near_dup / ann_lsh) keeps its own 16/4 default
    (recall-per-cost tuned for near-identical pairs, measured top-5
    recall 0.46 here); pass planes/bands explicitly to trade recall
    for candidate volume.
    """
    if planes is None:
        planes = _default_planes(
            [
                queries.select(F.col(q_vec).alias("v")),
                corpus.select(F.col(c_vec).alias("v")),
            ],
            n_planes=bands * 3,
        )
    qn = queries.select(
        F.col(q_id).alias("id"), F.col(q_vec).cast("array<double>").alias("v")
    )
    cn = corpus.select(
        F.col(c_id).alias("id"), F.col(c_vec).cast("array<double>").alias("v")
    )
    qb = _hyperplane_banded(qn, planes, bands, "id", "v").alias("q")
    cb = _hyperplane_banded(cn, planes, bands, "id", "v").alias("c")
    # score BEFORE deduplicating: a pair sharing j bands is scored j
    # times map-side (j <= bands, identical results), but the
    # dropDuplicates shuffle then carries three scalars per candidate
    # instead of two full embedding vectors
    scored = (
        qb.join(cb, (F.col("q.band") == F.col("c.band")) & (F.col("q.bb") == F.col("c.bb")))
        .select(
            F.col("q.id").alias("qid"),
            F.col("c.id").alias("id"),
            cosine_expr(F.col("q.v"), F.col("c.v")).alias("cosine"),
        )
        .dropDuplicates(["qid", "id"])
    )
    return _topk_per_query(scored, k)


# ---------------------------------------------------------------- IVF
def ivf_build(
    df: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: k-means centroids (Spark ML, fixed seed)
    + cluster assignment per vector.

    Scale path: persist the assigned table partitioned by ``cluster``
    (or bucket the Iceberg table on it) so a probe reads only the
    n_probe nearest partitions — partition pruning does the candidate
    selection, the refine step is a small exact top-k.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec_df = df.withColumn(
        "_v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="_v").fit(vec_df)
    assigned = model.transform(vec_df).select(
        id_col, F.col(vec_col), F.col("prediction").alias("cluster")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe centroids nearest to the query (driver-side
    math over n_centroids values — metadata scale), then exact cosine
    top-k over only those clusters' vectors."""

    def cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        da = sum(x * x for x in a) ** 0.5
        db = sum(y * y for y in b) ** 0.5
        return num / (da * db) if da > 0 and db > 0 else 0.0

    probes = sorted(
        range(len(centroids)), key=lambda i: -cos(query_vec, centroids[i])
    )[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = assigned.where(F.col("cluster").isin([int(p) for p in probes]))
    return (
        cand.select(
            F.col(id_col),
            cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def assign_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (max-cosine) assignment against a small FIXED
    codebook of literal centroid vectors — a narrow, shuffle-free map:
    the codebook is a plan literal (broadcast by construction), the
    argmax is ``array_max`` over (cosine, -index) structs so exact-tie
    resolution is deterministic (lowest index wins).

    Adds ``cluster`` (int) and ``centroid_cos`` (double) columns.  The
    all-zero vector has cosine 0 to every centroid (cosine_expr's
    denom-0 convention) and deterministically lands in cluster 0.
    """
    v = F.col(vec_col).cast("array<double>")
    cands = [
        F.struct(
            cosine_expr(v, F.array(*[F.lit(float(x)) for x in c])).alias("cos"),
            F.lit(-i).alias("neg_idx"),
        )
        for i, c in enumerate(centroids)
    ]
    best = F.array_max(F.array(*cands))
    return df.withColumn("cluster", -best["neg_idx"]).withColumn(
        "centroid_cos", best["cos"]
    )


def semdedup(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    n_clusters: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping near-identical
    vectors WITHIN each cluster — the pairwise cost is bounded per
    cluster instead of corpus-wide, which is the entire scale trick.

    Two codebook tiers:
      * ``centroids`` given — fixed literal codebook, fully
        deterministic and SQL-expressible (the oracle tier; the
        harness derives the codebook from the first k vectors).
      * ``centroids=None`` — k-means via ``ivf_build`` (Spark ML,
        fixed seed): the production tier, sharing the IVF coarse
        quantizer.

    Keeper convention: a vector is DROPPED when a smaller-id vector in
    the same cluster has cosine >= threshold (min-id keeper, matching
    ``elect_keepers``/the incremental tiers; the paper instead keeps
    the member farthest from the centroid — a policy knob, not a
    structural difference).  Identical vectors collapse to min-id
    representatives before the self-join (the hot-bucket guard every
    dedup tier here carries), which is semantics-preserving: members
    are dominated by their identical smaller-id representative by
    construction.

    100 TB shape: assignment is a narrow map (no shuffle); the
    self-join shuffles by ``cluster`` once on each side.  Size the
    codebook ~sqrt(N) per the paper so per-cluster candidate sets stay
    bounded; persist/bucket the assigned table on ``cluster`` so
    repeated passes co-locate for free, and let AQE split a skewed
    mega-cluster.

    Caching contract: the assigned (id, v, cluster) table is persisted
    (MEMORY_AND_DISK — four plan branches consume it) and registered
    under the ``"semdedup"`` tag in :mod:`ocr_project_spark.caching`;
    long-lived drivers should ``caching.release("semdedup")`` after
    the consuming action.

    Returns one row per input vector: (id_col, cluster, keep).
    """
    from ocr_project_spark.operators.dedup import _collapse_identical

    if centroids is None:
        _, centroids = ivf_build(
            df, n_centroids=n_clusters, id_col=id_col, vec_col=vec_col, seed=seed
        )
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    reps, member_edges = _collapse_identical(
        vecs.select("id", F.col("v").alias("sig")), F.col("sig")
    )
    asg = assign_centroids(
        reps.select("id", F.col("sig").alias("v")), centroids, vec_col="v"
    ).select("id", "v", "cluster")
    # `asg` is consumed from four branches (both sides of the
    # domination self-join, the keep join-back, and the member
    # cluster lookup) — persist it so the scan -> collapse -> assign
    # chain computes once (the same cut curate_corpus makes; measured
    # there as a 6-scan plan without it).  At 100 TB this cut is a
    # WRITE: land the assigned table bucketed by `cluster`, as the
    # docstring's scale note says.  Registered under the "semdedup"
    # caching tag (ocr_project_spark.caching) for post-action release.
    asg = caching.track(asg, "semdedup")
    a, b = asg.alias("a"), asg.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") > F.col("b.id")),
        )
        .where(cosine_expr(F.col("a.v"), F.col("b.v")) >= F.lit(threshold))
        .select(F.col("a.id").alias("id"))
        .distinct()
    )
    rep_out = asg.join(
        dominated.withColumn("_dom", F.lit(True)), "id", "left"
    ).select("id", "cluster", F.col("_dom").isNull().alias("keep"))
    member_out = (
        member_edges.select(F.col("id_a").alias("id"), F.col("id_b").alias("_rep"))
        .join(rep_out.select(F.col("id").alias("_rep"), "cluster"), "_rep")
        .select("id", "cluster", F.lit(False).alias("keep"))
    )
    return rep_out.unionByName(member_out).withColumnRenamed("id", id_col)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    min_df: int = 1,
    persist_index: bool = False,
) -> DataFrame:
    """BM25 lexical top-k retrieval: rank documents against a query set.

    The lexical complement of the embedding ANN tiers (cosine_topk /
    knn_join) — the retrieval primitive behind targeted pretraining-
    data selection (select corpus documents most similar to a benchmark
    or domain seed set) and behind the decontaminate operator's
    "which doc matched" follow-up.  Standard Okapi/Lucene scoring over
    DISTINCT query terms (query-side term frequency ignored, as Lucene
    does):

        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))   (>= 0)
        score(q, d) = sum_t idf(t) * tf * (k1+1)
                      / (tf + k1 * (1 - b + b * dl / avgdl))

    Returns (query_id, doc_id, score, rank), rank 1..top_n per query
    by score descending, ties broken on doc_id ascending.

    Cross-engine determinism (the lm_score ladder): idf is rounded to
    6 decimals before the product (bare libm ln); every other factor
    is a chain of identical-input IEEE ops (k1/b exactly representable,
    avgdl = integer token sum / integer N computed once driver-side);
    the per-(query, doc) sum is rounded to 4 BEFORE the ranking window
    so the top-n cut compares identical doubles.

    Shape at scale: the postings build is one map-side-combining
    shuffle on (doc_id, term); document length rides in the aggregate
    (max of a per-doc constant) so no extra join.  df re-aggregates
    per term and joins back term-keyed — vocabulary-scale, broadcast
    by AQE; ``min_df`` prunes the hapax tail of the df table exactly
    like lm_score's bigram pruning.  The DISTINCT query-term set is
    explicitly broadcast (queries are the small side by construction),
    so the corpus-side postings never shuffle for the match — the only
    corpus-sized exchange after the postings build is the final
    (query_id, doc_id) score aggregation, bounded by matched postings,
    and the per-query top-n runs as WindowGroupLimit (partial top-n
    per partition before the query_id exchange).  N and the token-sum
    for avgdl are one scalar action over the doc-length projection.

    ``persist_index=True`` materializes the (doc_id, term, tf, dl)
    postings table — the deliberate inverted-index cut: the table
    feeds BOTH the df aggregate and the query match, so without it the
    corpus tokenizes twice per query set.  The trade is memory for
    recompute: the cached footprint is postings-scale (one row per
    distinct (doc, term)), held at MEMORY_AND_DISK and registered
    under the ``"bm25_index"`` tag in :mod:`ocr_project_spark.caching`
    — long-lived drivers should ``caching.release("bm25_index")``
    after the consuming action.  At 100 TB the same cut is a WRITE:
    land the postings bucketed by term (a real inverted index) and
    serve every query set from storage.  Default False keeps the
    one-shot pipeline shape (tfidf_top_terms' one-consumer argument).
    """
    from pyspark.sql import Window

    tf, dfq, qt, n_docs, avgdl = _bm25_postings(
        docs, queries, id_col, text_col, query_id_col, query_text_col, min_df,
        persist_index=persist_index,
    )
    part = _bm25_part(n_docs, avgdl, k1, b)

    matched = (
        tf.join(F.broadcast(qt), "term")
        .join(dfq, "term")
        .select("query_id", "doc_id", part.alias("_part"))
    )
    scored = (
        matched.groupBy("query_id", "doc_id")
        .agg(F.sum("_part").alias("_m"))
        .select(
            "query_id",
            "doc_id",
            (F.expr("(_m + 50L) div 100L") / F.lit(1e4)).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(top_n))
        .select("query_id", "doc_id", "score", "rank")
    )


def _bm25_postings(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id_col: str,
    query_text_col: str,
    min_df: int,
    persist_index: bool = False,
):
    """Shared BM25 index build: (tf, df, distinct query terms) plus the
    two corpus scalars (N, avgdl).  Parameter-free — everything k1/b
    touch happens in _bm25_part — so ensemble scorers reuse one build.
    ``persist_index`` caches the tf postings table (tag "bm25_index")
    so the df aggregate and the query match share one corpus
    tokenize."""
    from ocr_project_spark.functions.text import word_tokens

    t = docs.select(
        F.col(id_col).alias("doc_id"),
        word_tokens(F.col(text_col)).alias("_t"),
    ).select("doc_id", "_t", F.size("_t").alias("dl"))

    stats = t.select(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")
    ).collect()[0]
    n_docs, sum_dl = stats["n"], stats["sdl"] or 0
    avgdl = (float(sum_dl) / float(n_docs)) if n_docs else 1.0

    terms = t.select(
        "doc_id", "dl", F.explode_outer("_t").alias("term")
    ).where(F.col("term").isNotNull())
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    if persist_index:
        tf = caching.track(tf, "bm25_index")
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfq = dfq.where(F.col("df") >= F.lit(min_df))

    qt = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode_outer(word_tokens(F.col(query_text_col))).alias("term"),
        )
        .where(F.col("term").isNotNull())
        .distinct()
    )
    return tf, dfq, qt, n_docs, avgdl


def _bm25_part(n_docs: int, avgdl: float, k1: float, b: float) -> Column:
    """Per-posting BM25 contribution over the matched (tf, df, dl) row —
    the identical expression chain bm25_topk documents, so grid scoring
    is bit-equal to the single-parameter path."""
    idf = F.round(
        F.log(
            1.0
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        6,
    )
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - float(b))
        + F.lit(float(b)) * F.col("dl") / F.lit(float(avgdl))
    )
    part = (
        idf * F.col("tf") * F.lit(float(k1) + 1.0) / (F.col("tf") + norm)
    )
    # integer MICRO units: the per-(query, doc) sum of parts is then
    # exact integer arithmetic (association-order-proof) and the final
    # 4-decimal rounding avoids the .00005 float boundary where Spark
    # and a SQL oracle round apart (the dsir/lm convention)
    return F.round(part * F.lit(1e6), 0).cast("long")


def bm25_topk_grid(
    docs: DataFrame,
    queries: DataFrame,
    params: list[tuple[float, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    top_n: int = 10,
    min_df: int = 1,
    persist_index: bool = False,
) -> DataFrame:
    """BM25 over a (k1, b) parameter grid in ONE index pass: every
    ranking bm25_topk would produce per parameter pair, from a single
    postings build, a single broadcast query-term match, and a single
    score aggregate.

    Returns (param_id, query_id, doc_id, score, rank) where param_id
    indexes ``params`` and each param_id slice is row-identical to
    ``bm25_topk(docs, queries, k1=.., b=..)`` (same expression chain,
    same rounding ladder, same tie-break — pinned in tests).

    Why it exists: the postings build (corpus tokenize + two term
    aggregates) dominates BM25 cost and is parameter-FREE — k1/b only
    touch the final per-posting arithmetic.  Retrieval ensembles
    (rrf_fuse over several parameterizations, hyperparameter sweeps)
    otherwise rebuild the index once per member; at corpus scale that
    multiplies the only corpus-sized shuffles by the grid size.  Here
    the grid adds one projected column and one aggregate column per
    member — the matched-postings table is scanned once.

    Shape at scale: identical to bm25_topk (see its docstring) with
    len(params) score columns riding the same map-side-combining
    aggregate; the explode to long form happens AFTER the (query_id,
    doc_id) aggregate, on a table bounded by matched query-doc pairs,
    and the per-(param, query) top-n runs as WindowGroupLimit.

    ``persist_index`` is the same postings materialization as
    bm25_topk's — see its docstring for the memory/recompute trade
    and the ``caching.release("bm25_index")`` contract.
    """
    if not params:
        raise ValueError("bm25_topk_grid needs at least one (k1, b) pair")
    from pyspark.sql import Window

    tf, dfq, qt, n_docs, avgdl = _bm25_postings(
        docs, queries, id_col, text_col, query_id_col, query_text_col, min_df,
        persist_index=persist_index,
    )
    matched = (
        tf.join(F.broadcast(qt), "term")
        .join(dfq, "term")
        .select(
            "query_id",
            "doc_id",
            *[
                _bm25_part(n_docs, avgdl, k1, b).alias(f"_p{i}")
                for i, (k1, b) in enumerate(params)
            ],
        )
    )
    scored = (
        matched.groupBy("query_id", "doc_id")
        .agg(
            *[F.sum(f"_p{i}").alias(f"_m{i}") for i in range(len(params))]
        )
        .select(
            "query_id",
            "doc_id",
            *[
                (F.expr(f"(_m{i} + 50L) div 100L") / F.lit(1e4)).alias(
                    f"_s{i}"
                )
                for i in range(len(params))
            ],
        )
    )
    long = scored.select(
        "query_id",
        "doc_id",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("param_id"),
                        F.col(f"_s{i}").alias("score"),
                    )
                    for i in range(len(params))
                ]
            )
        ),
    )
    w = Window.partitionBy("param_id", "query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        long.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(top_n))
        .select("param_id", "query_id", "doc_id", "score", "rank")
    )


def _rr_micro(k: int, rank_col: str):
    """1/(k + rank) rounded to 6 decimals, scaled to an integer MICRO
    value — addends pinned per the determinism ladder, and the fused
    sum stays exact integer arithmetic at any list count."""
    return F.round(
        F.round(F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col)), 6)
        * F.lit(1e6),
        0,
    ).cast("long")


def rrf_fuse(
    rankings: list[DataFrame] | DataFrame,
    k: int = 60,
    query_id_col: str = "query_id",
    doc_id_col: str = "doc_id",
    rank_col: str = "rank",
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): combine two or
    more per-query rankings — e.g. bm25_topk's lexical list and
    knn_join's embedding list — into one hybrid ranking, the standard
    retrieval-ensemble step:

        rrf(q, d) = sum over rankings r containing (q, d) of
                    1 / (k + rank_r(q, d))

    Rank-based, so the input lists' score scales never need
    calibration.  Returns (query_id, doc_id, rrf_score, n_lists,
    rank), rank 1..top_n per query by fused score descending, ties
    broken on n_lists descending (documents found by more lists win)
    then doc_id ascending.

    Cross-engine determinism: each reciprocal 1/(k + rank) is rounded
    to 6 decimals (the division itself is exact-input IEEE but the
    SUM of reciprocals is order-sensitive, so the addends are pinned
    first) and scaled to an integer MICRO value; the fused sum is
    exact integer arithmetic, rounded to 4 decimals by integer
    division BEFORE the ranking window.

    Shape at scale: a union of the (already small, top-n-per-query)
    ranking tables, one map-side-combining aggregate on
    (query_id, doc_id), and a WindowGroupLimit top-n per query — no
    join at all; the fused table is bounded by
    sum(len(ranking_i)) <= n_rankings x n_queries x top_n_input.

    ``rankings`` may instead be a SINGLE DataFrame holding all the
    member rankings' rows already stacked (e.g. bm25_topk_grid's long
    output, one ranking per param_id slice): RRF only sums
    1/(k + rank) per (query, doc) membership row, so the pre-unioned
    form needs no per-list split — and, crucially, no re-execution of
    a shared upstream lineage once per list.  The caller owns the
    >= 2-members invariant in that form (each (query_id, doc_id) must
    appear at most once per member ranking, as in any ranking table).
    """
    if isinstance(rankings, DataFrame):
        u = rankings.select(
            F.col(query_id_col).alias("query_id"),
            F.col(doc_id_col).alias("doc_id"),
            _rr_micro(k, rank_col).alias("_rrm"),
        )
    else:
        if len(rankings) < 2:
            raise ValueError(
                f"rrf_fuse needs at least 2 rankings, got {len(rankings)}"
            )
        parts = []
        for r in rankings:
            parts.append(
                r.select(
                    F.col(query_id_col).alias("query_id"),
                    F.col(doc_id_col).alias("doc_id"),
                    _rr_micro(k, rank_col).alias("_rrm"),
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
    fused = (
        u.groupBy("query_id", "doc_id")
        .agg(
            F.sum("_rrm").alias("_m"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        # 4-decimal rounding in exact integer micro arithmetic (the
        # dsir/lm convention): a micro sum ending in ..50 sits on the
        # .00005 boundary where Spark and a SQL oracle round apart
        .select(
            "query_id",
            "doc_id",
            (F.expr("(_m + 50L) div 100L") / F.lit(1e4)).alias("rrf_score"),
            "n_lists",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("n_lists").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(top_n))
        .select("query_id", "doc_id", "rrf_score", "n_lists", "rank")
    )
