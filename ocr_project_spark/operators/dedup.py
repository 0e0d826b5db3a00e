"""Deduplication operators for large-scale corpus hygiene.

Not present in the reference (single-document library); added per the
training-data-pipeline mandate.  Four tiers:

  exact          md5(normalized text) hash-groupBy — one shuffle
  ngram_jaccard  pairwise token-set Jaccard above a threshold on a
                 bounded candidate set (the exact oracle for the
                 approximate tiers)
  minhash_lsh    MinHash signatures via k independent keyed md5 hashes
                 (string-min per hash — deterministic and portable to
                 the DuckDB oracle), banded into LSH buckets so
                 candidate pairs come from a bucket equi-join, never a
                 theta join.  This is the 100 TB-scale path.
  simhash        16-bit SimHash from token md5 nibble votes (pure
                 column expressions; near-dup = Hamming <= r via
                 bit-band bucketing, pigeonhole-exact)
  clusters       pairs -> connected components (iterative min-label
                 propagation, one equi-join per round) -> keeper
                 election; the last stage every dedup tier feeds
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_project_spark import caching
from ocr_project_spark.functions.text import word_tokens


def normalized_text(text: Column) -> Column:
    return F.array_join(word_tokens(text), " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical normalized texts -> keeper id + duplicate count."""
    return (
        df.select(F.md5(normalized_text(F.col(text_col))).alias("text_hash"), id_col)
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingle set over a PRE-MATERIALIZED token array
    column.  Callers should project the tokens first (HOF lambdas
    re-evaluate inline subexpressions once per element, so an inline
    word_tokens turns the transform O(tokens^2) per document)."""
    cnt = F.size(toks)
    return F.when(cnt >= n, F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), cnt - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )).otherwise(F.array(F.array_join(toks, " ")))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle set straight from text — convenience Column
    form; pipelines should materialize word_tokens in a projection and
    use shingles_from_tokens (see its docstring for why)."""
    return shingles_from_tokens(word_tokens(text), n)


def jaccard_sets(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard — exact but O(n^2); callers bound the
    input (it is the verification oracle for minhash_lsh_pairs)."""
    s = df.select(
        F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("_t")
    ).select("id", shingles_from_tokens(F.col("_t"), n).alias("sh"))
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jaccard_sets(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signature_from_shingles(sh: Column, k: int = 16) -> Column:
    """k MinHash values over a PRE-COMPUTED shingle array column: min
    over shingles of md5(i || shingle).

    String-min of keyed md5 == a permutation-min sketch; identical
    and deterministic in Spark and DuckDB (the oracle requirement),
    unlike murmur-based hashes which differ across engines.

    Taking the shingle column (not the raw text) matters for cost: the
    k keyed hashes each reference the same array, so the tokenize +
    n-gram build runs once per document instead of relying on the
    optimizer's common-subexpression luck across k copies.
    """

    def _keyed(i: int):
        prefix = f"{i}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    return F.array(
        *[F.array_min(F.transform(sh, _keyed(i))) for i in range(k)]
    )


def minhash_signature(text: Column, n: int = 3, k: int = 16) -> Column:
    """k MinHash values straight from text; see
    minhash_signature_from_shingles (callers building a pipeline should
    materialize the shingle column once and use that form)."""
    return minhash_signature_from_shingles(shingles(text, n), k)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
) -> DataFrame:
    """(id, sig array<string>) MinHash signatures, DataFrame-level —
    the corpus-scale form.  Identical values to ``minhash_signature``
    (same keyed-md5 string-min sketch), but shingles explode to one row
    each and the k mins run as ONE codegen'd hash aggregate with
    map-side partial combine: the shuffle carries one k-string partial
    per doc per task, and each shingle is hashed exactly k times in a
    single pass (the Column form re-walks the shingle array per hash
    key)."""
    # tokens materialized in their own projection BEFORE the shingle
    # HOF — shingles(text) inline would re-run word_tokens once per
    # transform element (the O(tokens^2) trap shingles_from_tokens
    # documents; CollapseProject keeps the projection because _t is
    # referenced more than once, so the split is load-bearing).
    # explode_outer, not explode: plain explode makes the optimizer
    # infer `size(shingles) > 0` and push it down, duplicating the
    # shingle build into an interpreted scan Filter (shingles is
    # never empty, so the inferred filter is pure waste); the
    # isNotNull post-filter restores exact explode semantics.
    ex = (
        df.select(F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("_t"))
        .select("id", F.explode_outer(shingles_from_tokens(F.col("_t"), n)).alias("_s"))
        .where(F.col("_s").isNotNull())
    )
    agg = ex.groupBy("id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("_s")))).alias(f"_h{i}")
            for i in range(k)
        ]
    )
    return agg.select(
        "id", F.array(*[F.col(f"_h{i}") for i in range(k)]).alias("sig")
    )


def _minhash_banded(sig_df: DataFrame, k: int, bands: int) -> DataFrame:
    """(id, sig array<string>) -> (id, band, bucket) banded LSH keys:
    the signature split into ``bands`` row-groups of k/bands hashes,
    each group md5-collapsed to one bucket key."""
    rows = k // bands
    return sig_df.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.array_join(
                                F.slice(F.col("sig"), b * rows + 1, rows), "|"
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Signature of k hashes split into ``bands`` bands of k/bands rows;
    docs sharing any band hash land in the same bucket.  Candidate
    generation is a groupBy + self-equi-join on (band, bucket_hash) —
    shuffle-partitioned by bucket, no cross product.  At 100 TB scale
    this is the only join shape that survives: bucket sizes are
    bounded, and AQE skew-split handles hot buckets.
    """
    sig = minhash_signatures(df, id_col, text_col, n, k)
    banded = _minhash_banded(sig, k, bands)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH duplicate clusters with the identical-signature
    hot-bucket guard — the MinHash counterpart of ``simhash_clusters``
    (same hazard, same fix): docs sharing a FULL k-hash signature are
    mutual near-dup candidates by construction and never need pairwise
    enumeration, so each signature group collapses to its min-id
    representative BEFORE the band self-join, and the members rejoin
    the graph as (member -> representative) star edges.  On
    boilerplate-heavy corpora — exactly where dedup matters — the band
    join cost drops from sum-of-docs^2 to sum-of-distinct-sigs^2 per
    bucket.

    Clusters are IDENTICAL to
    ``duplicate_clusters(minhash_lsh_pairs(df))`` (pinned by test):
    identical-signature members share every band bucket with their
    representative, so the star edges reconnect exactly the paths the
    collapse removed."""
    sigs = minhash_signatures(df, id_col, text_col, n, k)
    reps, member_edges = _collapse_identical(
        sigs, F.md5(F.array_join(F.col("sig"), "|"))
    )
    banded = _minhash_banded(reps, k, bands)
    a, b = banded.alias("a"), banded.alias("b")
    rep_pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return duplicate_clusters_star(rep_pairs.unionByName(member_edges))


def minhash_dedup_incremental(
    new_docs: DataFrame,
    store: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    store_policy: str = "admitted",
) -> tuple[DataFrame, DataFrame]:
    """Incremental near-dup admission: dedup a NEW batch of documents
    against a persisted signature store — the production shape for
    continuous corpus ingestion, where re-running whole-corpus dedup
    per arrival is O(corpus) instead of O(batch).

    ``store`` is (id, sig array<string>) MinHash signatures of
    previously seen documents (None/empty for the first batch).
    Returns ``(admitted, new_store)``:

    * ``admitted`` — (id) new docs to keep: one min-id representative
      per in-batch near-dup cluster, excluding clusters any member of
      which band-collides with the store.
    * ``new_store`` — the signature store after this batch.
      ``store_policy='admitted'`` (default) grows it by admitted docs
      only — dedup against the RETAINED corpus, the standard choice;
      ``'all'`` grows it by every seen doc, which also rejects future
      docs that near-dup a previously REJECTED one.

    Collision = shared LSH band bucket, the same candidate tier as
    ``minhash_lsh_pairs`` (exact-Jaccard verification is the separate
    bounded oracle tier).  Scale: signatures are k strings per doc
    (store stays corpus-COUNT-sized, never corpus-BYTES-sized); the
    store probe is a band-bucket semi-join, in-batch clustering runs
    over the batch only, and every join hashes (band, bucket) or id —
    no broadcast of corpus-sized state anywhere.
    """
    if store_policy not in ("admitted", "all"):
        raise ValueError(f"unknown store_policy {store_policy!r}")
    sig_new = minhash_signatures(new_docs, id_col, text_col, n, k)
    # Identical-signature collapse — the same hot-bucket guard as
    # minhash_clusters, and ingest batches are exactly the
    # boilerplate-heavy workload that motivates it: a batch of 10k
    # copies of one page must cost 10k star edges, not a 10k^2 band
    # self-join.  Members share every band bucket with their
    # representative, so rep-level band collisions (in-batch and
    # vs-store) are exactly member-level collisions.
    reps, member_edges = _collapse_identical(
        sig_new, F.md5(F.array_join(F.col("sig"), "|"))
    )
    bn = _minhash_banded(reps, k, bands)
    if store is not None:
        bs = _minhash_banded(store, k, bands)
        store_hits = (
            bn.join(bs, ["band", "bucket"], "left_semi").select("id").distinct()
        )
    else:
        store_hits = sig_new.select("id").limit(0)

    a, b = bn.alias("a"), bn.alias("b")
    rep_pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _incremental_admit(
        sig_new, rep_pairs, member_edges, store_hits, store, store_policy
    )


def _incremental_admit(
    sig_new: DataFrame,
    rep_pairs: DataFrame,
    member_edges: DataFrame,
    store_hits: DataFrame,
    store: DataFrame | None,
    store_policy: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared admission tail for the incremental dedup tiers: cluster
    the batch's collision graph, reject clusters touching the store,
    keep one min-id representative per surviving cluster plus the
    unclustered non-colliding singles, and grow the store per policy."""
    clusters = duplicate_clusters_star(rep_pairs.unionByName(member_edges))
    bad_clusters = (
        clusters.join(store_hits, "id", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    ok_clusters = clusters.join(bad_clusters, "cluster_id", "left_anti")
    cluster_keepers = elect_keepers(ok_clusters).select(
        F.col("keeper_id").alias("id")
    )
    singles = (
        sig_new.select("id")
        .join(clusters.select("id"), "id", "left_anti")
        .join(store_hits, "id", "left_anti")
    )
    admitted = singles.unionByName(cluster_keepers)

    if store_policy == "all":
        grown = sig_new
    else:
        grown = sig_new.join(admitted, "id", "left_semi")
    new_store = store.unionByName(grown) if store is not None else grown
    return admitted, new_store


# ---------------------------------------------------------------- simhash
def simhash_signature(text: Column, bits: int = 64) -> Column:
    """SimHash bit-string over the distinct word-token set.

    Per bit b: each token votes +1/-1 by whether hex digit (b % 32) of
    md5(key_b || token) is >= '8' (== high nibble bit, portable to the
    DuckDB oracle via plain string comparison); the bit is 1 iff the
    vote sum is >= 0.  Near-identical token sets flip few votes, so
    Hamming distance tracks set difference — the classic SimHash
    property.

    One md5 yields 32 portable high-nibble bits, so ``bits`` > 32 uses
    ceil(bits/32) independent keyed hashes per token (key 0 = bare
    md5(token), preserving the 16-bit oracle tier byte-for-byte; key k
    = md5("k|" || token)).  Default is 64: 16-bit signatures have
    4-bit bands whose 16 distinct values degenerate the band equi-join
    toward a cross join beyond ~10^5 docs; 64 bits at the default
    bands = max_hamming + 1 = 4 give 16-bit band values and
    corpus-scale fan-out (see simhash_pairs' banding rationale and
    tests/test_dedup_clusters.py::test_simhash64_band_fanout_bounded).
    """
    toks = F.array_distinct(word_tokens(text))
    n_keys = -(-bits // 32)

    # Single-pass vote-vector aggregate: each token contributes one
    # +/-1 array of length ``bits`` (its md5 hex digits split to chars
    # once per keyed hash), folded with zip_with.  The naive form — one
    # F.aggregate per bit — re-evaluates the md5 transform per bit
    # (64x the hashing work; measured 25s vs ~1s for 600 sf0.1 docs).
    # NB: pyspark HOF lambdas must be exactly unary (a second param —
    # even a default — is treated as the element index), so keys are
    # captured via a closure factory, not default args.
    def _keyed_digits(k: int):
        prefix = None if k == 0 else f"{k}|"

        def digits(t):
            h = F.md5(t) if prefix is None else F.md5(F.concat(F.lit(prefix), t))
            chars = F.slice(F.split(h, ""), 1, 32)
            return F.transform(
                chars, lambda c: F.when(c >= F.lit("8"), 1).otherwise(-1)
            )

        return digits

    keyed = [_keyed_digits(k) for k in range(n_keys)]

    def vote_vector(t):
        v = F.concat(*[d(t) for d in keyed]) if n_keys > 1 else keyed[0](t)
        return F.slice(v, 1, bits)

    zeros = F.array_repeat(F.lit(0), bits)
    votes = F.aggregate(
        toks,
        zeros,
        lambda acc, t: F.zip_with(acc, vote_vector(t), lambda a, v: a + v),
    )
    return F.array_join(
        F.transform(
            votes, lambda v: F.when(v >= 0, F.lit("1")).otherwise(F.lit("0"))
        ),
        "",
    )


def _vote_digits(t: Column, key: int) -> Column:
    """Per-token +/-1 votes for the 32 hex digits of one keyed md5."""
    h = F.md5(t) if key == 0 else F.md5(F.concat(F.lit(f"{key}|"), t))
    return F.transform(
        F.slice(F.split(h, ""), 1, 32),
        lambda c: F.when(c >= F.lit("8"), 1).otherwise(-1),
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """(id, sig) SimHash signatures, DataFrame-level — the corpus-scale
    form.  Bit-for-bit identical to ``simhash_signature`` (pinned by
    the same oracles) but ~3x faster: tokens explode to one +/-1 vote
    row each and the per-bit sums run as a codegen'd hash aggregate
    with MAP-SIDE partial combine, so the shuffle carries one 64-int
    partial per doc per task, never the tokens.  The Column-expression
    form pays interpreted nested-HOF cost per token instead; keep it
    for embedding the signature inside a larger expression.
    """
    n_keys = -(-bits // 32)
    toks = F.array_distinct(word_tokens(F.col(text_col)))
    v = F.concat(*[_vote_digits(F.col("_t"), k) for k in range(n_keys)])
    if bits != 32 * n_keys:
        v = F.slice(v, 1, bits)
    ex = df.select(F.col(id_col).alias("id"), F.explode_outer(toks).alias("_t"))
    # empty-token docs: explode_outer keeps a null row; null votes are
    # ignored by sum and coalesce to 0, preserving the all-'1' signature
    agg = ex.select("id", v.alias("_v")).groupBy("id").agg(
        *[
            F.coalesce(F.sum(F.col("_v")[i]), F.lit(0)).alias(f"_b{i}")
            for i in range(bits)
        ]
    )
    sig = F.concat(
        *[
            F.when(F.col(f"_b{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )
    return agg.select("id", sig.alias("sig"))


def hamming_words_expr(a: Column, b: Column, bits: int) -> Column:
    """Hamming distance via XOR + popcount over <=32-bit words parsed
    from the bit strings — constant-cost vs the 64-substring compare
    chain (hamming_expr), which this replaces in the join hot path."""
    terms = []
    for w in range(-(-bits // 32)):
        lo = w * 32
        width = min(32, bits - lo)
        wa = F.conv(F.substring(a, lo + 1, width), 2, 10).cast("long")
        wb = F.conv(F.substring(b, lo + 1, width), 2, 10).cast("long")
        terms.append(F.bit_count(wa.bitwiseXOR(wb)))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def hamming_expr(a: Column, b: Column, bits: int = 64) -> Column:
    terms = [
        F.when(F.substring(a, i + 1, 1) != F.substring(b, i + 1, 1), 1).otherwise(0)
        for i in range(bits)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def banded_bitstring(
    sig_df: DataFrame,
    bits: int,
    bands: int,
    sig_col: str = "sig",
    carry: tuple[str, ...] = ("sig",),
) -> DataFrame:
    """(id, <carry...>, band, bb) banded keys: the ``sig_col`` bit
    string split into ``bands`` substrings, one output row per band.
    ``carry`` columns ride along for the post-join exact verification
    (the Hamming sig for the SimHash tiers, the raw vector for the
    hyperplane-LSH tiers in operators/similarity.py)."""
    rows = bits // bands
    return sig_df.select(
        "id",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(F.col(sig_col), b * rows + 1, rows).alias("bb"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("x"),
    ).select("id", *carry, "x.band", "x.bb")


def _simhash_banded(sig_df: DataFrame, bits: int, bands: int) -> DataFrame:
    """(id, sig) -> (id, sig, band, bb): banded_bitstring with the sig
    itself as the verification payload."""
    return banded_bitstring(sig_df, bits, bands)


def _collapse_identical(
    sig_df: DataFrame, sig_key: Column
) -> tuple[DataFrame, DataFrame]:
    """Identical-signature collapse shared by the cluster and
    incremental tiers: group (id, sig) rows by ``sig_key``, keep the
    min-id representative per group, and return (reps(id, sig),
    member->representative star edges (id_a, id_b))."""
    keyed = sig_df.select("id", "sig", sig_key.alias("_sk"))
    reps = keyed.groupBy("_sk").agg(
        F.min("id").alias("id"), F.first("sig").alias("sig")
    )
    member_edges = (
        keyed.select(F.col("id").alias("_m"), "_sk")
        .join(reps.select("_sk", F.col("id").alias("_rep")), "_sk")
        .where(F.col("_m") != F.col("_rep"))
        .select(F.col("_m").alias("id_a"), F.col("_rep").alias("id_b"))
    )
    return reps.select("id", "sig"), member_edges


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidate generation is banded (pigeonhole: with ``bands`` bands
    and <= bands-1 differing bits, at least one band is identical), so
    the join is a bucket equi-join on (band, band_bits) — the same
    shape as MinHash-LSH and the only shape that survives at 100 TB.
    The exact Hamming filter then removes band-collision false
    positives; with max_hamming <= bands-1 the result equals the
    brute-force all-pairs scan (the DuckDB oracle).

    Default bands = max_hamming + 1 = 4: the FEWEST bands that keep
    the pigeonhole guarantee, hence the WIDEST (16-bit) band values
    and the most selective buckets — banding is output-invariant (the
    Hamming filter is exact), so extra bands only add recall margin
    the guarantee already covers while making every bucket hotter
    (8-bit bands: 256 values; measured 4.2x more band collisions on
    the dense synthetic corpus for identical output).
    """
    assert max_hamming <= bands - 1, "pigeonhole guarantee needs max_hamming < bands"
    sig = simhash_signatures(df, id_col, text_col, bits)
    banded = _simhash_banded(sig, bits, bands)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bb"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming_words_expr(
                F.col("a.sig"), F.col("b.sig"), bits
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """(id, cluster_id) near-dup clusters via SimHash, with the
    identical-signature collapse that keeps banded LSH alive on
    boilerplate-heavy corpora.

    ``simhash_pairs`` enumerates candidate pairs within band buckets —
    O(B^2) per bucket.  On self-similar corpora (the common case that
    motivates dedup!) one bucket can hold most of the corpus precisely
    because the docs ARE near-identical, and pair enumeration
    degenerates quadratically.  But docs sharing a FULL signature are
    mutual duplicates at Hamming 0 and never need pairing: collapse
    each signature group to its min-id representative first, band-join
    only the DISTINCT signatures, and seed the component computation
    with the (member -> representative) star edges.  Cluster output is
    IDENTICAL to clustering simhash_pairs(df) (pinned by test) at
    sum-of-distinct-sigs-squared join cost instead of
    sum-of-docs-squared.
    """
    sigs = simhash_signatures(df, id_col, text_col, bits)
    reps, member_edges = _collapse_identical(sigs, F.col("sig"))
    banded = _simhash_banded(reps, bits, bands)
    a, b = banded.alias("a"), banded.alias("b")
    rep_pairs = (
        a.join(b, ["band", "bb"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming_words_expr(F.col("a.sig"), F.col("b.sig"), bits).alias("h"),
        )
        .where(F.col("h") <= max_hamming)
        .select("id_a", "id_b")
        .distinct()
    )
    return duplicate_clusters_star(rep_pairs.unionByName(member_edges))


def simhash_dedup_incremental(
    new_docs: DataFrame,
    store: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    store_policy: str = "admitted",
) -> tuple[DataFrame, DataFrame]:
    """SimHash counterpart of ``minhash_dedup_incremental``: admit only
    new docs that are not near-duplicates (Hamming <= ``max_hamming``)
    of the stored corpus or of an earlier-id doc in their own batch.

    ``store`` is (id, sig bit-string) from previous batches; returns
    ``(admitted, new_store)`` with the same store policies.  Unlike the
    MinHash tier, collisions here are hamming-VERIFIED after the band
    equi-join (the banded join is the pigeonhole-exact candidate
    generator: any pair within max_hamming shares >= one exact band for
    bands > max_hamming).  Identical-signature collapse bounds the
    band join on boilerplate-heavy batches, same as simhash_clusters.
    Scale: the store is one ``bits``-char string per doc; all joins
    hash (band, band-substring) or id.
    """
    if store_policy not in ("admitted", "all"):
        raise ValueError(f"unknown store_policy {store_policy!r}")
    if max_hamming > bands - 1:
        # pigeonhole: a pair within max_hamming differing bits is only
        # guaranteed an identical band when bands > max_hamming — a
        # looser setting would silently ADMIT near-duplicates the band
        # join never sees (simhash_pairs asserts the same bound)
        raise ValueError(
            f"max_hamming={max_hamming} needs bands > max_hamming "
            f"(got bands={bands}) for the banded join to be exact"
        )
    sig_new = simhash_signatures(new_docs, id_col, text_col, bits)
    reps, member_edges = _collapse_identical(sig_new, F.col("sig"))
    bn = _simhash_banded(reps, bits, bands)
    if store is not None:
        bs = _simhash_banded(store, bits, bands)
        store_hits = (
            bn.alias("a")
            .join(bs.alias("b"), ["band", "bb"])
            .where(
                hamming_words_expr(F.col("a.sig"), F.col("b.sig"), bits)
                <= max_hamming
            )
            .select(F.col("a.id").alias("id"))
            .distinct()
        )
    else:
        store_hits = sig_new.select("id").limit(0)

    a, b = bn.alias("a"), bn.alias("b")
    rep_pairs = (
        a.join(b, ["band", "bb"])
        .where(F.col("a.id") < F.col("b.id"))
        .where(
            hamming_words_expr(F.col("a.sig"), F.col("b.sig"), bits)
            <= max_hamming
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _incremental_admit(
        sig_new, rep_pairs, member_edges, store_hits, store, store_policy
    )


# ---------------------------------------------------- duplicate clusters
def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id).

    The missing last stage of every dedup tier: candidate PAIRS
    (from MinHash-LSH / SimHash / cosine) must become CLUSTERS before a
    keeper can be elected.  Algorithm: iterative min-label propagation —
    every vertex takes the minimum label among itself and its
    neighbors; fixpoint in <= diameter iterations (few, for near-dup
    graphs which are small cliques/chains).  Each iteration is one
    shuffle-partitioned equi-join + hash aggregate, the large-vertex-set
    formulation (no driver-side graph, no GraphX dependency).

    Convergence is detected with a count of changed labels per
    iteration — a driver-side scalar, metadata cost only.
    """
    sym = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                ).alias("new_cluster_id"),
                "cluster_id",
            )
        )
        changed = updated.where(
            F.col("new_cluster_id") != F.col("cluster_id")
        ).count()
        labels = updated.select(
            "id", F.col("new_cluster_id").alias("cluster_id")
        ).localCheckpoint(eager=True)  # truncate the iterative lineage
        if changed == 0:
            break
    return labels


def duplicate_clusters_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) -> (id, cluster_id).

    Same contract as duplicate_clusters, different round complexity:
    min-label propagation needs O(diameter) joins, which on chain-shaped
    duplicate graphs (a->b->c->... from pairwise near-dup edges) means
    O(n) shuffles; star contraction converges in O(log n) rounds on any
    graph.  Each round is two groupBy+join passes over the edge set,
    with localCheckpoint lineage truncation.

      large-star: every node u links its LARGER neighbors to
                  m(u) = min(neighbors(u) + {u})
      small-star: on the (now big->small) edges, every node u links its
                  smaller neighbors and itself to that minimum

    Fixpoint: the edge set stops changing; every surviving edge then
    points directly at its component minimum.
    """
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonicalize to big -> small so both phases see directed edges
    e = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct().localCheckpoint(eager=True)

    prev_sig = None
    for _ in range(max_iterations):
        # --- large-star over the symmetric view ---
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        large = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star over the (big -> small) edges ---
        m2 = large.groupBy("u").agg(F.min("v").alias("mn"))
        joined = large.join(m2, "u")
        small = (
            joined.where(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .unionByName(m2.select("u", F.col("mn").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        e = small
        # convergence: order-insensitive signature of the edge set
        # (driver-side scalar; one metadata-cheap aggregate per round)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig

    labels = e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = nodes.join(
        e.select(F.col("u").alias("id")).distinct(), "id", "left_anti"
    ).select("id", F.col("id").alias("cluster_id"))
    return labels.unionByName(roots)


def elect_keepers(
    clusters: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """(id, cluster_id) -> (cluster_id, keeper_id, n_members).

    Keeper = min id per cluster (deterministic; swap the orderBy for a
    quality score at the call site to keep the best document instead).
    """
    return clusters.groupBy(cluster_col).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


# ------------------------------------------------- duplicated passages
def duplicate_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated PASSAGES — the exact-substring dedup
    tier of a training-data pipeline (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": repeated n-gram spans
    across documents are memorization fuel even when whole-document
    dedup passes).

    A passage is a word n-gram shingle; a shingle that occurs in
    >= ``min_docs`` DISTINCT documents is flagged.  Output, one row
    per duplicated passage:

        (passage, n_docs, min_doc_id, max_doc_id)

    Plan shape (the only one that survives 100 TB): shingles explode
    to one row per (doc, shingle) — dedup'd per doc map-side by the
    array_distinct inside ``shingles`` — then ONE hash aggregate
    keyed by the shingle computes the distinct-doc count and witness
    ids with map-side partial combine.  No joins, no windows; hot
    shingles (boilerplate sentences) are exactly what surfaces, and
    the aggregate carries one partial per shingle per task regardless
    of how many documents share it.
    """
    # tokens in their own projection first — an inline shingles(text)
    # re-runs word_tokens per transform element (the O(tokens^2) trap
    # shingles_from_tokens documents), which at 10x data dominated the
    # whole flag pass before this split.
    ex = (
        df.select(F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("_t"))
        .select(
            "id",
            F.explode_outer(shingles_from_tokens(F.col("_t"), n)).alias("passage"),
        )
        .where(F.col("passage").isNotNull())
    )
    return (
        ex.groupBy("passage")
        .agg(
            # struct-wrapped so a null-id document still counts as one
            # distinct document (bare countDistinct drops NULL, which
            # silently under-flags passages shared with null-id docs)
            F.countDistinct(F.struct("id")).alias("n_docs"),
            F.min("id").alias("min_doc_id"),
            F.max("id").alias("max_doc_id"),
        )
        .where(F.col("n_docs") >= F.lit(min_docs))
    )


def scrub_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
    keep_first: bool = True,
    broadcast_artifacts: bool = False,
) -> DataFrame:
    """Remove cross-document duplicated passages from the text — the
    scrub half of the Lee et al. 2022 exact-substring dedup tier
    (duplicate_passages is the flag half): any word n-gram occurring
    in >= ``min_docs`` distinct documents is cut from every document,
    except (with ``keep_first``, the witness convention shared with
    dedup_lines) the min-id document containing it, which keeps its
    text intact for that passage.  A token is removed when ANY flagged
    n-gram window covers it, so overlapping duplicated passages scrub
    as one span, exactly like the suffix-array span removal the paper
    implements single-node.

    Returns (doc_id, clean_text, n_tokens_in, n_tokens_kept), one row
    per input document; documents with < n tokens (no shingle) pass
    through untouched (their tokens, space-joined).  Pure string and
    integer arithmetic — no float ladder needed for the oracle.

    Shape at scale: the flag pass is duplicate_passages' single
    map-side-combining aggregate, derived from the SAME (doc, pos,
    hash) window table the scrub side explodes — the corpus is
    tokenized and n-gram-hashed exactly once — and keyed by
    ``xxhash64`` of the n-token window ARRAY (equal keys iff equal
    token windows; no per-window string build) instead of the n-word
    string — the scrub side never needs the
    passage text, only its identity, so both the flag aggregate's
    shuffle and the window-explode join carry an 8-byte key where a
    ~`n` x avg-word-length string would otherwise ride per (doc, pos)
    row (~n x fewer shuffle bytes on the widest stage).  A 64-bit
    collision would scrub one innocent window with probability
    ~2^-64 per (window, flagged) pair — negligible against corpus
    sizes; the flag-half API (duplicate_passages) keeps exact string
    keys since its output contract carries the passage text.  The
    scrub pass explodes one row per (doc, window), joins the flagged
    table hash-keyed (vocabulary of REPEATED n-grams — far smaller
    than the corpus; AQE broadcasts it when it fits), re-aggregates
    blocked window starts per doc (sorted, deduped), and rebuilds the
    text in one LINEAR array pass: every blocked interval has fixed
    length ``n`` over sorted starts, so the union's free gaps fall out
    of consecutive start pairs directly (a gap opens exactly where
    s[i+1] - s[i] > n, plus the head/tail gaps) and the kept tokens
    are slice+flatten over those gaps — O(tokens + blocked windows)
    per document, worst case included.  (The previous per-token
    exists() test over the starts array was O(tokens x blocked
    windows), O(tokens^2/n) on a document that is ~all duplicated
    passages — the round-4 footnote this rewrite retires.)  The token
    array never rides through the window explode: windows carry
    (doc_id, pos, hash) only, and the rebuild joins the starts back
    id-keyed.

    Caching contract: the per-doc NESTED (doc_id, windows) table is
    persisted (MEMORY_AND_DISK) because the flag aggregate and the
    blocked-join probe side both scan it (each re-explodes from the
    compact cache); registered under the ``"scrub_passages"`` tag in
    :mod:`ocr_project_spark.caching` — long-lived drivers should
    ``caching.release("scrub_passages")`` after the consuming action.

    ``broadcast_artifacts``: the two duplicate-side tables — the
    flagged vocabulary (repeated n-grams only) and the per-doc
    blocked-starts aggregate (docs that lose >= 1 window) — are
    usually a small fraction of the corpus (measured on the synthetic
    sf10m corpus: 4.7% of the gram vocabulary, 4.9% of the docs).
    With the hint, both joins become broadcast hash joins and the two
    corpus-scale exchanges disappear: the (doc, pos, hash) window
    stream is probed map-side instead of shuffled+sorted, and the
    rebuild join stops shuffling the token arrays entirely — the only
    remaining corpus-scale exchange is the global flag aggregate,
    which is irreducible (every window must be counted across
    documents).  Leave False (shuffle joins, AQE decides) when
    duplication is dense — boilerplate-heavy web corpora can have a
    flagged set that is itself corpus-scale, and a forced broadcast
    of it would OOM the driver; the default path degrades gracefully,
    the hinted path does not.  Corollary: with both joins broadcast
    the operator is ONE narrow pipeline from scan to output, so scan
    splits bound its parallelism end-to-end — the input-layout rule
    (rows-per-file bounded at the ingest writer; README) is
    load-bearing here, where the shuffle path's exchange would
    re-spread a row-group-capped input as a side effect (measured: a
    single-file 50k-doc input ran the broadcast tier 2-way and LOST
    to the shuffle tier, 5.0 vs 3.9 s; the 64-file 500k-doc layout
    wins 4.7 → 4.0 s at local[32], and on separate-JVM clusters the
    savings include the serialized cross-executor shuffle itself).
    """
    t = df.select(
        F.col(id_col).alias("doc_id"), word_tokens(F.col(text_col)).alias("_t")
    )
    cnt = F.size(F.col("_t"))
    # window key = xxhash64 of the n-token slice ARRAY — array hashing
    # folds element boundaries, so equal keys <=> equal token windows
    # (strictly cleaner than hashing a joined string) and the per-
    # window string build disappears from the hot transform entirely
    windows = F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(0), cnt - n),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.slice(F.col("_t"), i + 1, n)).alias("ph"),
            ),
        ),
    )
    # persisted NESTED — one row per doc, windows as an array — not
    # exploded: the flag aggregate AND the blocked-join probe side
    # both scan this table (without the persist the whole tokenize +
    # window-hash lineage executes twice in the one query), and the
    # nested layout drops the per-window doc_id repetition from the
    # cached footprint (~40% of the exploded table's bytes at avg
    # ~54 windows/doc) — this operator is memory-bandwidth-bound at
    # high core counts (BASELINE.md, curation-ladder scaling), so
    # cached bytes scanned twice are the scarce resource, and each
    # consumer re-explodes from the compact cache instead.
    t2 = caching.track(t.select("doc_id", windows.alias("_ws")), "scrub_passages")
    # hash-keyed flag pass: the shuffle key (and witness join key) is
    # xxhash64(passage), so the passage string never leaves the map
    # side.  The flag stream explodes the per-doc DISTINCT hashes, so
    # one row per (doc, ph) by construction and a plain count(*) IS
    # the distinct-doc count — a single map-side-combining aggregate,
    # where a countDistinct over all positions would plan the
    # two-shuffle distinct-expand over the full window stream.
    # (explode_outer + isNotNull, not plain explode: the optimizer
    # infers size()>0 from a plain explode and duplicates the
    # array_distinct∘transform into a per-row scan filter — the
    # _spans_out_flat trap.)  A short doc's whole-text pseudo-shingle,
    # which the flag-half API still emits, can never equal an n-token
    # window — a k-token join has exactly k-1 separators — so its
    # absence here is observably identical.
    flagged = (
        t2.select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(F.transform(F.col("_ws"), lambda w: w["ph"]))
            ).alias("ph"),
        )
        .where(F.col("ph").isNotNull())
        .groupBy("ph")
        .agg(
            # count(*), not countDistinct: rows are (doc, ph)-unique
            # already, and count(*) keeps the null-id document's row
            # (the struct-wrap nuance the old distinct form needed)
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .where(F.col("n_docs") >= F.lit(min_docs))
        .select("ph", "min_doc_id")
    )
    pos_sh = (
        t2.select("doc_id", F.explode_outer("_ws").alias("_w"))
        .where(F.col("_w").isNotNull())
        .select("doc_id", F.col("_w.pos").alias("pos"), F.col("_w.ph").alias("ph"))
    )
    if broadcast_artifacts:
        flagged = F.broadcast(flagged)
    blocked = pos_sh.join(flagged, "ph")
    if keep_first:
        # null-safe: a null-id document must still be scrubbed (a
        # plain != yields NULL and silently exempts it from every
        # flagged passage); it is the witness only when min_doc_id is
        # itself null, i.e. no non-null doc carries the passage
        blocked = blocked.where(
            ~F.col("doc_id").eqNullSafe(F.col("min_doc_id"))
        )
    starts = blocked.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("pos")).alias("_ss")
    )
    if broadcast_artifacts:
        starts = F.broadcast(starts)
    ss = F.coalesce(F.col("_ss"), F.expr("array()").cast("array<int>"))
    # gap-merge rebuild: starts are sorted and every blocked interval
    # is [s, s+n), so the union's free gaps are (head) [0, ss[0]),
    # (mid) [ss[i]+n, ss[i+1]) for each consecutive pair, (tail)
    # [ss[-1]+n, n_tokens) — empty gaps (a >= b) filtered out.  For an
    # unscrubbed doc (ss empty) the head gap degenerates to the whole
    # token range.  Linear per row; no per-token membership scan.
    m = F.size(ss)
    _gap = lambda a, b: F.struct(a.alias("a"), b.alias("b"))  # noqa: E731
    empty_gaps = F.array().cast("array<struct<a:int,b:int>>")
    # try_element_at: ANSI element_at throws on the empty-starts array
    # even under a when() guard (both branches are projected)
    head = F.array(_gap(F.lit(0), F.coalesce(F.try_element_at(ss, F.lit(1)), cnt)))
    mids = F.when(
        m >= 2,
        F.transform(
            F.sequence(F.lit(1), m - 1),
            lambda i: _gap(
                F.try_element_at(ss, i) + F.lit(n), F.try_element_at(ss, i + 1)
            ),
        ),
    ).otherwise(empty_gaps)
    tail = F.when(
        m >= 1, F.array(_gap(F.try_element_at(ss, F.lit(-1)) + F.lit(n), cnt))
    ).otherwise(empty_gaps)
    gaps = F.filter(
        F.concat(head, mids, tail), lambda g: g["b"] > g["a"]
    )
    kept = F.flatten(
        F.transform(gaps, lambda g: F.slice(F.col("_t"), g["a"] + 1, g["b"] - g["a"]))
    )
    # null-safe join-back: a null-id document's blocked starts live in
    # starts' null group; a plain equi-join would never hand them back
    # and the doc would silently skip its scrub
    return (
        t.join(
            starts.withColumnRenamed("doc_id", "_sid"),
            t["doc_id"].eqNullSafe(F.col("_sid")),
            "left",
        )
        .select(
            t["doc_id"],
            F.array_join(kept, " ").alias("clean_text"),
            F.size("_t").cast("long").alias("n_tokens_in"),
            F.size(kept).cast("long").alias("n_tokens_kept"),
        )
    )
