"""spark-submit --py-files packaging smoke test (north_rule packaging
clause).  Runs the real job entrypoint as a subprocess against a tiny
fixture corpus and checks the committed output + JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, ROOT)
    from ocr_project_spark.sources.generate import write_corpus_parquet
    from tools.make_pyfiles import build

    doc_path, cand_path = write_corpus_parquet(str(tmp_path / "in"), n_docs=60)
    zip_path = build(str(tmp_path / "pkg.zip"))
    out_dir = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(ROOT, "ocr_project_spark", "job.py"),
            "--input", doc_path,
            "--candidates", cand_path,
            "--output", out_dir,
            "--run-id", "smoke",
            "--buckets", "4",
            "--bucket-batch-size", "2",
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["docs"] == 60
    assert summary["spans"] > 0
    assert os.path.isdir(os.path.join(out_dir, "extracted"))
    assert os.path.isdir(os.path.join(out_dir, "watermarks"))


@pytest.mark.slow
def test_spark_submit_bucketed_mode(spark, tmp_path):
    # NOTE: takes the shared `spark` fixture for the prep step — a local
    # get_spark(master="local[2]") here would create the process's FIRST
    # SparkContext on local[2], which the session-scoped fixture would
    # then silently inherit (getOrCreate ignores master on an existing
    # context), shrinking defaultParallelism for every later test.
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, ROOT)
    from ocr_project_spark.sources.bucketed import write_bucketed
    from ocr_project_spark.sources.generate import write_corpus_parquet
    from tools.make_pyfiles import build

    doc_path, cand_path = write_corpus_parquet(str(tmp_path / "in"), n_docs=40)
    write_bucketed(
        spark,
        spark.read.parquet(doc_path),
        spark.read.parquet(cand_path),
        str(tmp_path / "bkt"),
        n_buckets=4,
    )
    # note: the submitted job runs in a fresh JVM/catalog and re-declares
    # the external bucketed tables over this location
    zip_path = build(str(tmp_path / "pkg.zip"))
    out_dir = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(ROOT, "ocr_project_spark", "job.py"),
            "--bucketed-location", str(tmp_path / "bkt"),
            "--bucketed-n", "4",
            "--output", out_dir,
            "--run-id", "bkt-smoke",
            "--no-checkpoint",
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["docs"] == 40


def test_job_sample_rate_checkpointed(spark, corpus_dfs, tmp_path):
    """--sample-rate flows through the checkpointed path: the output
    holds exactly the hash_sample keeper set (deterministic, so the
    in-test expectation is exact, not statistical) and the manifest
    pins the sampling semantics."""
    sys.path.insert(0, ROOT)
    from ocr_project_spark.operators.curate import hash_sample

    docs_df, cands_df = corpus_dfs
    docs50 = docs_df.limit(50).cache()
    pq = str(tmp_path / "docs_pq")
    cq = str(tmp_path / "cands_pq")
    docs50.write.mode("overwrite").parquet(pq)
    cands_df.join(docs50.select("doc_id"), "doc_id").write.mode(
        "overwrite"
    ).parquet(cq)
    expect = {
        r["doc_id"]
        for r in hash_sample(
            spark.read.parquet(pq), rate=0.5, salt="smoke"
        ).select("doc_id").collect()
    }
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, PYTHONPATH=ROOT)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "ocr_project_spark", "job.py"),
         "--input", pq, "--candidates", cq,
         "--output", out_dir, "--run-id", "sample-smoke",
         "--buckets", "4", "--bucket-batch-size", "4",
         "--sample-rate", "0.5", "--sample-salt", "smoke",
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    got = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out_dir}/extracted")
        .select("doc_id").collect()
    }
    assert got == expect
    meta = json.loads(
        open(f"{out_dir}/_run_meta/sample-smoke.json").read()
    )
    blob = json.dumps(meta)
    assert '"sample_rate": 0.5' in blob and '"sample_salt": "smoke"' in blob


def test_parser_exposes_retry_flags():
    sys.path.insert(0, ROOT)
    from ocr_project_spark.config import load_config
    from ocr_project_spark.job import build_parser

    args = build_parser(load_config()).parse_args(
        ["--output", "/tmp/x", "--run-id", "r",
         "--retry-candidates", "/tmp/rc", "--retry-threshold", "0.4"]
    )
    assert args.retry_candidates == "/tmp/rc"
    assert args.retry_threshold == 0.4
    # config layer can set the threshold default
    cfg = load_config(overrides=["extract.retry_threshold=0.25"])
    args2 = build_parser(cfg).parse_args(["--output", "/tmp/x", "--run-id", "r"])
    assert args2.retry_threshold == 0.25


@pytest.mark.slow
def test_job_filters_disabled_engine_from_retry_pass(spark, corpus_dfs, tmp_path):
    """A config-disabled engine must not re-enter fusion through
    --retry-candidates: the job applies the same F6/F7 availability
    filter to the retry table as to the primary candidates."""
    from pyspark.sql import functions as F

    docs_df, cands_df = corpus_dfs
    doc_path = str(tmp_path / "docs")
    cand_path = str(tmp_path / "cands")
    retry_path = str(tmp_path / "retry")
    docs_df.write.parquet(doc_path)
    cands_df.write.parquet(cand_path)
    # retry pass from engine rec_x at conf 0.99: with threshold 1.0
    # every span routes to retry and rec_x wins everywhere — unless the
    # availability filter drops it
    cands_df.groupBy("doc_id", "offset").agg(
        F.lit("rec_x").alias("engine"),
        F.concat(F.lit("RETRY:"), F.min("text")).alias("text"),
        F.lit(0.99).alias("confidence"),
    ).select("doc_id", "offset", "engine", "text", "confidence").write.parquet(
        retry_path
    )

    def run_job(out_dir, extra):
        env = dict(os.environ)
        env["PYTHONPATH"] = ROOT
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(ROOT, "ocr_project_spark", "job.py"),
                "--input", doc_path,
                "--candidates", cand_path,
                "--retry-candidates", retry_path,
                "--retry-threshold", "1.0",
                "--output", out_dir,
                "--run-id", "retry-filter",
                "--master", "local[2]",
                "--no-checkpoint",
                *extra,
            ],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=str(tmp_path),
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        out = spark.read.parquet(os.path.join(out_dir, "extracted"))
        return out.select(
            F.sum(
                F.size(
                    F.filter(
                        F.coalesce(F.col("spans"), F.array()),
                        lambda s: s["text"].startswith("RETRY:"),
                    )
                )
            ).alias("n")
        ).collect()[0]["n"]

    n_enabled = run_job(str(tmp_path / "out_on"), [])
    assert n_enabled > 0  # control: retry text reaches the output
    n_disabled = run_job(
        str(tmp_path / "out_off"), ["--set", "engines.rec_x.enabled=false"]
    )
    assert n_disabled == 0  # disabled engine never re-enters via retry


def test_parser_exposes_lang_filter_flag():
    sys.path.insert(0, ROOT)
    from ocr_project_spark.config import load_config
    from ocr_project_spark.job import build_parser

    args = build_parser(load_config()).parse_args(
        ["--output", "/tmp/x", "--run-id", "r", "--lang-filter"]
    )
    assert args.lang_filter is True
    # config layer can switch it on without the flag
    cfg = load_config(overrides=["extract.lang_filter=true"])
    args2 = build_parser(cfg).parse_args(["--output", "/tmp/x", "--run-id", "r"])
    assert args2.lang_filter is True
    args3 = build_parser(load_config()).parse_args(
        ["--output", "/tmp/x", "--run-id", "r"]
    )
    assert args3.lang_filter is False


@pytest.mark.slow
def test_job_lang_filter_end_to_end(spark, corpus_dfs, tmp_path):
    """--lang-filter executes the doc-language derivation + candidate
    join inside the job and matches the in-process filtered pipeline.
    (The corpus's <a> markup tokenizes to stopword 'a', so a subset of
    docs genuinely detects as 'en' — constraining rec_a to 'fr' makes
    the filter bite on exactly those docs.)"""
    docs_df, cands_df = corpus_dfs
    doc_path = str(tmp_path / "docs")
    cand_path = str(tmp_path / "cands")
    docs_df.write.parquet(doc_path)
    cands_df.write.parquet(cand_path)
    out_dir = str(tmp_path / "out_lang")

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "ocr_project_spark", "job.py"),
            "--input", doc_path,
            "--candidates", cand_path,
            "--output", out_dir,
            "--run-id", "lang-e2e",
            "--master", "local[2]",
            "--no-checkpoint",
            "--lang-filter",
            "--set", "engines.rec_a.languages=fr",
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = spark.read.parquet(os.path.join(out_dir, "extracted"))
    assert out.count() == 200

    from ocr_project_spark.functions.fuse import (
        doc_langs_from_spans,
        filter_candidates_by_language,
    )
    from ocr_project_spark.operators.extract import extract

    def key(df):
        return {
            r["doc_id"]: [tuple(s) for s in (r["spans"] or [])]
            for r in df.collect()
        }

    cfg = {"engines": {"rec_a": {"languages": ["fr"]}}}
    filtered = filter_candidates_by_language(
        cands_df, doc_langs_from_spans(docs_df), cfg
    )
    want = key(extract(docs_df, filtered))
    got = key(out)
    assert got == want
    # ...and the constraint actually dropped candidates somewhere
    # (en-detected docs lose rec_a), so the equality is not vacuous
    assert want != key(extract(docs_df, cands_df))


def test_job_flag_combos_fail_fast():
    """Invalid flag combinations are refused BEFORE the Spark session
    spins up (millisecond failure, and safe to exercise in-process)."""
    sys.path.insert(0, ROOT)
    from ocr_project_spark.job import main

    cases = [
        # --retry-candidates without any candidates input
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r",
         "--retry-candidates", "/tmp/rc"],
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r",
         "--candidates", "/tmp/c", "--retry-candidates", "/tmp/rc",
         "--chunk-mega-docs"],
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r",
         "--candidates", "/tmp/c", "--retry-candidates", "/tmp/rc",
         "--normalize", "balanced"],
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r",
         "--normalize", "balanced", "--chunk-mega-docs"],
        # --lang-filter without any candidates input
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r",
         "--lang-filter"],
        # --sample-rate outside (0, 1]
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r",
         "--sample-rate", "0.0"],
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r",
         "--sample-rate", "1.5"],
    ]
    for argv in cases:
        with pytest.raises(SystemExit):
            main(argv)


def test_parser_exposes_sample_flags():
    sys.path.insert(0, ROOT)
    from ocr_project_spark.job import build_parser

    args = build_parser().parse_args(
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r",
         "--sample-rate", "0.25", "--sample-salt", "train"]
    )
    assert args.sample_rate == 0.25
    assert args.sample_salt == "train"
    # default: no sampling
    args = build_parser().parse_args(
        ["--input", "/tmp/i", "--output", "/tmp/o", "--run-id", "r"]
    )
    assert args.sample_rate is None


def test_job_scrub_pii_end_to_end(spark, corpus_dfs, tmp_path):
    """--scrub-pii flows through the checkpointed job: planted emails
    in the input span text never reach the committed output, and the
    manifest pins the switch."""
    sys.path.insert(0, ROOT)
    from pyspark.sql import functions as F

    docs_df, cands_df = corpus_dfs
    planted = docs_df.limit(40).withColumn(
        "spans",
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.regexp_replace(
                    s["text"], r"\bdata\b", "bob@example.com"
                ).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    ).cache()
    pq = str(tmp_path / "docs_pq")
    cq = str(tmp_path / "cands_pq")
    planted.write.mode("overwrite").parquet(pq)
    cands_df.join(planted.select("doc_id"), "doc_id").write.mode(
        "overwrite"
    ).parquet(cq)
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, PYTHONPATH=ROOT)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "ocr_project_spark", "job.py"),
         "--input", pq, "--candidates", cq,
         "--output", out_dir, "--run-id", "scrub-smoke",
         "--buckets", "4", "--bucket-batch-size", "4",
         "--scrub-pii", "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = spark.read.parquet(f"{out_dir}/extracted")
    texts = out.selectExpr(
        "explode(spans) s"
    ).selectExpr("s.text t").where("t IS NOT NULL").collect()
    assert texts, "no spans committed"
    assert all("bob@example.com" not in r["t"] for r in texts)
    assert any("<EMAIL>" in r["t"] for r in texts)
    meta = json.loads(open(f"{out_dir}/_run_meta/scrub-smoke.json").read())
    assert '"scrub_pii": true' in json.dumps(meta)
