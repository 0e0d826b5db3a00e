"""Incremental corpus curation: readStream -> curate -> append sink.

The batch curation ladder (operators/curate.curate_corpus) is one
corpus-wide plan; at 10^12 docs the corpus never arrives at once, so
this tier re-expresses it as trigger-once incremental batches over a
file source (the stream_extract pattern: ``availableNow`` drains only
files the stream checkpoint has not seen — "resume forever").

The projection-only stages (quality floor, language allowlist) are
per-document functions and stream trivially.  The dedup tiers need
cross-batch memory, carried in two metadata-scale state tables under
``state_dir`` (the signature-store design of *_dedup_incremental,
dedup.py:652+ — at deployment scale these are Iceberg tables like the
checkpoint watermarks):

* ``exact_store``  (_h, keeper)    — md5 of normalized text -> the
  winning keeper id, one row per distinct content hash ever seen.
* ``near_store``   (id, sig)       — SimHash bit-string of every exact
  KEEPER ever admitted (all keepers, not just 'kept' rows: in the
  batch ladder a doc whose own disposition is near_dup still condemns
  later members of its signature group, so the store must carry it).

Witness semantics and stream==batch parity: the batch ladder elects
the MIN-ID witness; the incremental ladder elects the FIRST-SEEN
witness (earlier batches win).  The two coincide exactly when ingest
order respects id order (earlier batches hold smaller ids) — the
natural shape for monotonically-assigned ids — and
tests/test_streaming_curate.py pins disposition/witness equality
against curate_corpus over the unioned corpus on such a split.
Dispositions are write-once by construction either way: a later
document never condemns an earlier one (the batch ladder's witness
is always a smaller id; the stream's is always an earlier batch).

Crash note: within one microbatch the output append commits before
the state overwrite, so a crash between them replays the batch with
the OLD state on restart — re-curation is deterministic, so the
replay appends duplicate-but-identical disposition rows (dedupe on
read by doc_id, or land both tables in Iceberg for the atomic form,
exactly like plans/checkpoint.py's stand-in caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_project_spark.functions.text import lang_guess, quality_score
from ocr_project_spark.operators.dedup import (
    _simhash_banded,
    hamming_words_expr,
    normalized_text,
    simhash_signatures,
)

EXACT_STORE = "exact_store"
NEAR_STORE = "near_store"


def curate_batch_incremental(
    docs: DataFrame,
    exact_store: DataFrame | None = None,
    near_store: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.4,
    languages: tuple[str, ...] = ("en",),
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One incremental step of the curation ladder: curate ``docs``
    against the cross-batch stores; returns ``(dispositions,
    new_exact_store, new_near_store)``.

    The disposition output matches operators/curate.curate_corpus
    row-for-row over the cumulative corpus when batches arrive in id
    order (module docstring).  Pure batch function — the streaming
    wrapper below feeds it microbatches, but it composes anywhere
    (e.g. a nightly incremental curation job over new partitions).

    Shape at scale: identical to curate_corpus per batch (one window
    shuffle for the exact tier, banded self-join for the near tier)
    plus one banded equi-join of batch reps against the near store —
    store-side work is (batch reps x matching bands), never
    store x store.
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands > max_hamming "
            f"(got bands={bands}) for the banded join to be exact"
        )
    txt = F.coalesce(F.col(text_col), F.lit(""))
    scored = docs.select(
        F.col(id_col).alias("id"),
        txt.alias("_text"),
        F.round(quality_score(txt), 3).alias("quality"),
        lang_guess(txt).alias("lang_guess"),
    ).withColumn("_h", F.md5(normalized_text(F.col("_text"))))
    q_ok = F.col("quality") >= F.lit(min_quality)
    l_ok = F.col("lang_guess").isin(*languages)
    ok = q_ok & l_ok

    # exact tier: the batch-window keeper (curate_corpus's windowed
    # conditional min) merged with the store's keeper for the hash —
    # least() skips nulls, so a store hit always wins (earlier batch)
    flagged = scored.withColumn(
        "_bk", F.min(F.when(ok, F.col("id"))).over(Window.partitionBy("_h"))
    )
    if exact_store is not None:
        flagged = flagged.join(
            exact_store.select("_h", F.col("keeper").alias("_sk")), "_h", "left"
        )
    else:
        flagged = flagged.withColumn("_sk", F.lit(None).cast("long"))
    flagged = flagged.withColumn("_keeper", F.least("_sk", "_bk"))
    is_keeper = ok & (F.col("id") == F.col("_keeper"))

    # near tier: curate_corpus's rep-collapsed banded self-join within
    # the batch, plus one banded probe of batch reps against the store
    keeper_docs = flagged.where(is_keeper).select("id", "_text")
    sigs = simhash_signatures(
        keeper_docs, id_col="id", text_col="_text", bits=bits
    )
    reps = sigs.groupBy("sig").agg(F.min("id").alias("_rid"))
    banded = _simhash_banded(
        reps.select(F.col("_rid").alias("id"), "sig"), bits, bands
    )
    a, b = banded.alias("a"), banded.alias("b")
    rep_nmin = (
        a.join(b, ["band", "bb"])
        .where(F.col("a.id") != F.col("b.id"))
        .where(
            hamming_words_expr(F.col("a.sig"), F.col("b.sig"), bits)
            <= F.lit(max_hamming)
        )
        .groupBy(F.col("a.id").alias("_rid"))
        .agg(F.min(F.col("b.id")).alias("_nmin"))
    )
    if near_store is not None:
        bs = _simhash_banded(near_store, bits, bands)
        store_nmin = (
            banded.alias("a")
            .join(bs.alias("b"), ["band", "bb"])
            .where(
                hamming_words_expr(F.col("a.sig"), F.col("b.sig"), bits)
                <= F.lit(max_hamming)
            )
            .groupBy(F.col("a.id").alias("_rid"))
            .agg(F.min(F.col("b.id")).alias("_snmin"))
        )
    else:
        store_nmin = reps.select(
            "_rid", F.lit(None).cast("long").alias("_snmin")
        ).limit(0)

    near_dups = (
        sigs.join(reps, "sig")
        .join(rep_nmin, "_rid", "left")
        .join(store_nmin, "_rid", "left")
        .select(
            "id",
            F.least(
                F.when(F.col("id") != F.col("_rid"), F.col("_rid")),
                F.when(F.col("_nmin") < F.col("id"), F.col("_nmin")),
                F.when(F.col("_snmin") < F.col("id"), F.col("_snmin")),
            ).alias("_w_near"),
        )
        .where(F.col("_w_near").isNotNull())
    )

    disposition = (
        F.when(~q_ok, F.lit("low_quality"))
        .when(~l_ok, F.lit("lang"))
        .when(F.col("id") != F.col("_keeper"), F.lit("exact_dup"))
        .when(F.col("_w_near").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    witness = F.when(
        ok & (F.col("id") != F.col("_keeper")), F.col("_keeper")
    ).otherwise(F.col("_w_near"))
    out = flagged.join(near_dups, "id", "left").select(
        F.col("id").alias(id_col),
        disposition.alias("disposition"),
        witness.alias("witness_id"),
        "quality",
        "lang_guess",
    )

    # state forward: merged exact keepers; near store gains ALL batch
    # exact keepers (module docstring: near_dup keepers still condemn)
    batch_exact = flagged.where(F.col("_keeper").isNotNull()).select(
        "_h", F.col("_keeper").alias("keeper")
    )
    if exact_store is not None:
        new_exact = (
            exact_store.unionByName(batch_exact)
            .groupBy("_h")
            .agg(F.min("keeper").alias("keeper"))
        )
    else:
        new_exact = batch_exact.groupBy("_h").agg(
            F.min("keeper").alias("keeper")
        )
    new_near = (
        near_store.unionByName(sigs.select("id", "sig"))
        if near_store is not None
        else sigs.select("id", "sig")
    )
    return out, new_exact, new_near


def _read_state(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    input_schema: str = "doc_id long, text string",
    max_files_per_trigger: int | None = None,
    **curate_kwargs,
) -> int:
    """Drain all unprocessed document files from ``input_dir`` through
    the incremental curation ladder into ``output_dir``; dedup state
    persists under ``state_dir``.  Returns the number of microbatches.
    Safe to call repeatedly; each call curates only newly-arrived
    files against everything already seen.
    """
    reader = spark.readStream.schema(input_schema).option(
        "latestFirst", "false"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    n_batches = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        exact = _read_state(spark, f"{state_dir}/{EXACT_STORE}")
        near = _read_state(spark, f"{state_dir}/{NEAR_STORE}")
        out, new_exact, new_near = curate_batch_incremental(
            batch_df, exact, near, **curate_kwargs
        )
        out.write.mode("append").parquet(output_dir)
        # State tables are rewritten via staging dirs, ALL stages
        # before ANY promote: every new state's lineage reads the old
        # state (new_near's keeper join reads the old exact store too),
        # so promoting one table in place would delete files a later
        # stage write still needs mid-plan.
        stores = ((EXACT_STORE, new_exact), (NEAR_STORE, new_near))
        for name, df in stores:
            df.write.mode("overwrite").parquet(f"{state_dir}/_stage_{name}")
        for name, _ in stores:
            spark.read.parquet(f"{state_dir}/_stage_{name}").write.mode(
                "overwrite"
            ).parquet(f"{state_dir}/{name}")
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]
