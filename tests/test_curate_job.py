"""curate_job.py CLI: the full flag-selected curation ladder run
in-process against the sf0.001 corpus — funnel monotonicity, output
contract, flag validation."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture(scope="module")
def ladder_out(spark, tmp_path_factory):
    from ocr_project_spark.curate_job import main

    out = str(tmp_path_factory.mktemp("curate_out"))
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
            "--run-id", "t1",
            # gopher with corpus-appropriate thresholds (the synthetic
            # vocabulary has one distinct stopword); clean_lines is off
            # because the corpus is single-line with short fragments
            "--gopher", "--gopher-set", "min_stopwords=1",
            "--gopher-set", "min_words=25",
            "--scrub-passages", "5",
            "--exact-dedup",
            "--lm-cutoffs", "3.0,3.6", "--lm-keep", "head,middle",
            "--bpe-merges", "30", "--pack-budget", "1024",
            "--shards", "4",
        ]
    )
    assert rc == 0
    return os.path.join(out, "t1")


def test_ladder_funnel_monotone_and_stages(ladder_out):
    funnel = json.load(open(os.path.join(ladder_out, "funnel.json")))["funnel"]
    stages = [f["stage"] for f in funnel]
    assert stages == [
        "00_input", "20_gopher", "40_scrub_passages",
        "50_exact_dedup", "60_lm_filter", "90_written",
    ]
    docs = [f["n_docs"] for f in funnel]
    toks = [f["n_tokens"] for f in funnel]
    # every stage can only shrink the corpus
    assert all(a >= b for a, b in zip(docs, docs[1:]))
    assert all(a >= b for a, b in zip(toks, toks[1:]))
    assert docs[0] == 500 and docs[-1] > 0
    # the gopher gate and the passage scrub both genuinely fired
    assert docs[1] < docs[0]
    assert toks[2] < toks[1]


def test_ladder_output_contract(spark, ladder_out):
    df = spark.read.parquet(os.path.join(ladder_out, "corpus.parquet"))
    assert set(df.columns) == {
        "doc_id", "text", "n_bpe_tokens", "pack_id", "shard", "pos",
    }
    rows = df.collect()
    n = len(rows)
    funnel = json.load(open(os.path.join(ladder_out, "funnel.json")))["funnel"]
    assert funnel[-1]["n_docs"] == n
    assert all(r.n_bpe_tokens > 0 for r in rows)
    assert {r.shard for r in rows} <= set(range(4))
    # pack budget respected for multi-doc packs
    from collections import defaultdict

    packs = defaultdict(list)
    for r in rows:
        packs[r.pack_id].append(r.n_bpe_tokens)
    for members in packs.values():
        if len(members) > 1:
            assert sum(members) <= 1024


def test_flag_validation():
    from ocr_project_spark.curate_job import main

    for argv in (
        ["--input", "x", "--output", "y", "--run-id", "r", "--dsir-n", "5"],
        ["--input", "x", "--output", "y", "--run-id", "r", "--bpe-merges", "5"],
        ["--input", "x", "--output", "y", "--run-id", "r",
         "--lm-cutoffs", "oops"],
        ["--input", "x", "--output", "y", "--run-id", "r",
         "--lm-cutoffs", "1,2", "--lm-keep", "bogus"],
        ["--input", "x", "--output", "y", "--run-id", "r",
         "--gopher", "--gopher-set", "min_words"],
    ):
        with pytest.raises(SystemExit):
            main(argv)


def test_dsir_stage_selects_subset(spark, tmp_path):
    from ocr_project_spark.curate_job import main

    out = str(tmp_path / "o")
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
            "--run-id", "t2",
            "--dsir-target", "/root/testdata/sf0.001/documents.parquet",
            "--dsir-n", "50",
        ]
    )
    assert rc == 0
    df = spark.read.parquet(os.path.join(out, "t2", "corpus.parquet"))
    assert df.count() == 50


def test_cap_per_source_stage(tmp_path):
    """--cap-per-source N caps every source to N docs (sf0.001: 20
    sources x 25 docs -> exactly 20*N survive) and records its funnel
    stage first, before any text-shaping stage."""
    from ocr_project_spark.curate_job import main

    out = str(tmp_path / "cap_out")
    rc = main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out,
            "--run-id", "tc",
            "--cap-per-source", "2",
        ]
    )
    assert rc == 0
    funnel = json.load(open(os.path.join(out, "tc", "funnel.json")))["funnel"]
    assert [f["stage"] for f in funnel] == [
        "00_input", "05_source_cap", "90_written",
    ]
    docs = [f["n_docs"] for f in funnel]
    assert docs == [500, 40, 40]


def test_observe_funnel_matches_persist(spark, tmp_path):
    """--funnel observe (single fused write action, counts via
    df.observe) must produce byte-identical funnel.json numbers and
    the same corpus row set as the default per-stage persist ladder —
    including through every fan-out stage kind: gopher (key-set
    join), scrub-passages (dual-scan cache), exact-dedup (window),
    lm filter (corpus-model join), shards (key fan-out)."""
    from ocr_project_spark.curate_job import main

    argv_common = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--run-id", "p",
        "--cap-per-source", "20",
        "--gopher", "--gopher-set", "min_stopwords=1",
        "--gopher-set", "min_words=25",
        "--scrub-passages", "5",
        "--exact-dedup",
        "--lm-cutoffs", "3.0,3.6", "--lm-keep", "head,middle",
        "--dsir-target", "/root/testdata/sf0.001/documents.parquet",
        "--dsir-n", "100",
        "--shards", "4",
    ]
    funnels, frames = {}, {}
    for mode in ("persist", "observe"):
        out = str(tmp_path / mode)
        rc = main(argv_common + ["--output", out, "--funnel", mode])
        assert rc == 0
        funnels[mode] = json.load(
            open(os.path.join(out, "p", "funnel.json"))
        )["funnel"]
        frames[mode] = spark.read.parquet(
            os.path.join(out, "p", "corpus.parquet")
        )
    assert funnels["observe"] == funnels["persist"]
    a, b = frames["persist"], frames["observe"]
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_funnel_report_metrics(tmp_path):
    """funnel.json carries throughput lineage: total wall + docs/sec
    in both modes, per-stage action walls only in persist mode (observe
    fuses all stages into the single write action by design)."""
    from ocr_project_spark.curate_job import main

    reports = {}
    for mode in ("persist", "observe"):
        out = str(tmp_path / mode)
        rc = main(
            [
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", out, "--run-id", "m", "--funnel", mode,
                "--scrub-pii", "--exact-dedup",
            ]
        )
        assert rc == 0
        reports[mode] = json.load(open(os.path.join(out, "m", "funnel.json")))
    for mode, r in reports.items():
        assert r["wall_s"] > 0 and r["docs_per_sec"] > 0
        assert r["funnel_mode"] == mode
    assert set(reports["persist"]["stage_wall_s"]) == {
        "00_input", "30_scrub_pii", "50_exact_dedup",
    }
    assert "stage_wall_s" not in reports["observe"]


def test_repartition_input_repairs_low_parallelism(spark, tmp_path):
    """--repartition-input N must (a) actually widen the partitioning
    the ladder's first persist freezes — the single-file sf0.001
    fixture scans as 1 task without it — and (b) leave the output row
    set identical to the unrepartitioned run (repartition is a
    row-preserving shuffle)."""
    from ocr_project_spark.curate_job import main

    outs = {}
    for tag, extra in [("plain", []), ("rep", ["--repartition-input", "6"])]:
        out = str(tmp_path / tag)
        rc = main(
            [
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", out,
                "--run-id", "r",
                "--scrub-pii", "--exact-dedup",
            ]
            + extra
        )
        assert rc == 0
        outs[tag] = os.path.join(out, "r", "corpus.parquet")
    plain = spark.read.parquet(outs["plain"])
    rep = spark.read.parquet(outs["rep"])
    # (a) the write inherits the repaired partitioning (dedup's
    # aggregate re-shuffles, so compare the parallel file counts of
    # a projection-only run instead: scrub-pii alone)
    # (b) row-set equality through the full pii+dedup ladder
    assert plain.count() == rep.count()
    assert (
        plain.exceptAll(rep).count() == 0 and rep.exceptAll(plain).count() == 0
    )
    # projection-only run: partition repair must survive to the writer
    for tag, extra, want in [
        ("p1", [], 1),
        ("p6", ["--repartition-input", "6"], 6),
    ]:
        out = str(tmp_path / ("pii_" + tag))
        rc = main(
            [
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", out,
                "--run-id", "r",
                "--scrub-pii",
            ]
            + extra
        )
        assert rc == 0
        n_files = len(
            [
                f
                for f in os.listdir(os.path.join(out, "r", "corpus.parquet"))
                if f.startswith("part-")
            ]
        )
        assert n_files == want, (tag, n_files)
