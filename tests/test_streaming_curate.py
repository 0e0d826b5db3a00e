"""Streaming curation parity: the trigger-once incremental curation
ladder (streaming/curate.py) must equal the one-shot batch ladder
(operators/curate.curate_corpus) disposition-for-disposition,
witness-for-witness over the cumulative corpus, on an id-ordered
batch split — the 'resume forever' story for curation."""

from __future__ import annotations

import pytest

from ocr_project_spark.operators.curate import curate_corpus
from ocr_project_spark.streaming.curate import (
    curate_batch_incremental,
    stream_curate,
)

# ~95 words of plain English prose: long enough that a one-word
# perturbation moves the 64-bit SimHash by only 1-3 bits (short texts
# flip 5-9 bits per word, above the max_hamming=3 gate — measured).
GOOD = (
    "the quick brown fox jumps over the lazy dog while the keeper of the old "
    "lighthouse watches from the stone tower and writes careful notes about "
    "every passing ship in a worn leather journal kept beside the brass lamp "
    "since the harbor first opened to trade many winters ago sailors have "
    "trusted the steady beam that sweeps across the dark water guiding each "
    "vessel safely past the hidden rocks toward the calm shelter of the bay "
    "where merchants unload their cargo and children gather to hear long "
    "stories about distant storms and the strange lights seen far beyond "
    "the horizon on quiet summer evenings"
)
TAIL = (
    " an entirely separate closing paragraph describes the annual festival "
    "when fishermen decorate their boats with colored lanterns and the whole "
    "town gathers on the pier to celebrate the first catch of the season"
)
# Measured hamming geometry (64-bit sig): GOOD-near1 = 2, near1-near2 = 2,
# GOOD-near2 = 4 (so doc 12 is near ONLY through doc 3 — a true chain),
# GOOD-near3 = 1, GOOD-(GOOD+TAIL) = 10.
NEAR1 = GOOD.replace("sailors", "mariners")
NEAR2 = NEAR1.replace("shelter", "refuge")
NEAR3 = GOOD.replace("lighthouse", "beacon")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture
def split_corpus(spark):
    """Two id-ordered batches exercising every cross-batch edge:
    exact dup across the boundary, near dup across the boundary
    (one-word perturbation), a near-dup CHAIN through a batch-1 doc
    whose own disposition is near_dup, low-quality and wrong-language
    rows in both batches, and fresh uniques."""
    b1 = [
        (1, GOOD),
        (2, GOOD + TAIL),      # kept: hamming 10 from GOOD
        (3, NEAR1),            # near dup of 1 -> witness 1
        (4, "!!!! #### @@@@ %%%% ^^^^ &&&&"),  # low quality
        (5, GOOD),             # exact dup of 1 (batch-internal)
    ]
    b2 = [
        (11, GOOD),            # exact dup of 1 ACROSS the boundary
        (12, NEAR2),           # near dup chain through 3 (itself near_dup)
        (13, NEAR3),           # near dup of 1 across boundary
        (14, "mas cerca de la frontera pero en otro idioma claramente"
             " escrito para fallar el filtro de idioma ingles aqui"),
        (15, "fresh unique content about streaming incremental ladders "
             "and watermark state tables that matches nothing before it"),
    ]
    return b1, b2


def _by_id(df):
    return {
        r["doc_id"]: (r["disposition"], r["witness_id"]) for r in df.collect()
    }


def test_incremental_equals_batch_on_ordered_split(spark, split_corpus):
    b1, b2 = split_corpus
    batch_truth = _by_id(curate_corpus(_mk(spark, b1 + b2)))

    out1, ex1, nr1 = curate_batch_incremental(_mk(spark, b1))
    # materialize state exactly as the stream wrapper would
    ex1 = spark.createDataFrame(ex1.collect(), ex1.schema)
    nr1 = spark.createDataFrame(nr1.collect(), nr1.schema)
    out2, _, _ = curate_batch_incremental(_mk(spark, b2), ex1, nr1)
    got = {**_by_id(out1), **_by_id(out2)}
    assert got == batch_truth


def test_incremental_single_batch_equals_curate_corpus(spark, split_corpus):
    """With no store and the whole corpus in one batch, the
    incremental ladder IS the batch ladder."""
    b1, b2 = split_corpus
    full = _mk(spark, b1 + b2)
    got, _, _ = curate_batch_incremental(full)
    assert _by_id(got) == _by_id(curate_corpus(full))


def test_near_store_carries_all_keepers(spark, split_corpus):
    """A batch-1 doc whose own disposition is near_dup must still
    condemn a batch-2 doc near ITS signature (the all-keepers store
    policy) — doc 12 chains through doc 3."""
    b1, b2 = split_corpus
    out1, ex1, nr1 = curate_batch_incremental(_mk(spark, b1))
    assert _by_id(out1)[3][0] == "near_dup"
    assert {r["id"] for r in nr1.collect()} >= {1, 2, 3}  # 3 is in the store
    out2, _, _ = curate_batch_incremental(_mk(spark, b2), ex1, nr1)
    got2 = _by_id(out2)
    assert got2[12] == ("near_dup", 3)
    assert got2[11] == ("exact_dup", 1)
    assert got2[13] == ("near_dup", 1)
    assert got2[14][0] == "lang"
    assert got2[15] == ("kept", None)


def test_stream_curate_two_invocations(spark, split_corpus, tmp_path):
    """The availableNow wrapper: two files arriving across two
    invocations curate identically to the batch ladder; the second
    call drains only the new file."""
    b1, b2 = split_corpus
    ind = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    st = str(tmp_path / "state")

    _mk(spark, b1).coalesce(1).write.mode("append").parquet(ind)
    n1 = stream_curate(spark, ind, out, ck, st)
    assert n1 >= 1
    first = spark.read.parquet(out)
    assert first.count() == len(b1)

    _mk(spark, b2).coalesce(1).write.mode("append").parquet(ind)
    n2 = stream_curate(spark, ind, out, ck, st)
    assert n2 >= 1

    got = _by_id(spark.read.parquet(out))
    assert got == _by_id(curate_corpus(_mk(spark, b1 + b2)))

    # a third call with nothing new appends nothing
    before = spark.read.parquet(out).count()
    stream_curate(spark, ind, out, ck, st)
    assert spark.read.parquet(out).count() == before
