"""Alternative ingest formats (S1 breadth): JSONL round-trip with
corrupt-line quarantine, pinned-schema multiline CSV, binaryFile media
ingest composing with the media operators."""

from __future__ import annotations

import os

from ocr_project_spark.sources.formats import (
    CORRUPT_COL,
    read_documents_csv,
    read_documents_jsonl,
    read_media_binaries,
    write_documents_jsonl,
)


def test_jsonl_round_trip_preserves_extraction(spark, corpus_dfs, tmp_path):
    from ocr_project_spark.operators.extract import extract

    docs_df, cands_df = corpus_dfs
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs_df, path)
    docs_j = read_documents_jsonl(spark, path)
    # same shape/types; nullability flags differ between the parquet
    # round-trip and the pinned ingest schema
    assert docs_j.schema.simpleString() == docs_df.schema.simpleString()

    def key(df):
        return {
            r["doc_id"]: [tuple(s) for s in (r["spans"] or [])]
            for r in extract(df, cands_df).collect()
        }

    assert key(docs_j) == key(docs_df)


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": "good", "spans": [{"kind": "text", "text": "a b c", '
        '"media_ref": null, "offset": 0}]}\n'
        "this is not json at all\n"
        '{"doc_id": "good2", "spans": []}\n'
    )
    clean = read_documents_jsonl(spark, str(p))
    assert {r["doc_id"] for r in clean.collect()} == {"good", "good2"}
    kept = read_documents_jsonl(spark, str(p), keep_corrupt=True)
    rows = kept.collect()
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(rows) == 3 and len(bad) == 1
    assert bad[0][CORRUPT_COL].startswith("this is not json")
    assert bad[0]["doc_id"] is None  # -> null_doc_id error row downstream


def test_csv_multiline_text_survives(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        'doc_id,url,lang,text,n_chars\n'
        '1,http://a,en,"line one\nline two",17\n'
        '2,http://b,unk,"plain",5\n'
    )
    df = read_documents_csv(spark, str(p))
    got = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got[1] == "line one\nline two"
    assert got[2] == "plain"
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "url", "lang", "text", "n_chars"
    ]


def test_binary_file_source_feeds_media_operators(spark, tmp_path):
    from ocr_project_spark.operators.media import media_features

    d = tmp_path / "blobs"
    d.mkdir()
    payloads = {}
    for i in range(4):
        body = bytes([i * 37 % 256]) * (100 + i)
        (d / f"m{i}.bin").write_bytes(body)
        payloads[f"m{i}.bin"] = body
    (d / "ignore.txt").write_text("not media")

    media = read_media_binaries(spark, str(d), glob="*.bin")
    rows = media.collect()
    assert len(rows) == 4
    got = {os.path.basename(r["media_ref"]): bytes(r["payload"]) for r in rows}
    assert got == payloads
    assert all(r["length"] == len(bytes(r["payload"])) for r in rows)

    feats = media_features(media.select("media_ref", "payload")).collect()
    assert len(feats) == 4
    assert all(f["mean_byte"] is not None for f in feats)

    capped = read_media_binaries(spark, str(d), glob="*.bin", limit=2)
    assert capped.count() == 2


def test_job_accepts_jsonl_input(spark, corpus_dfs, tmp_path):
    """job.py --input-format jsonl runs the single-pass pipeline over a
    JSONL corpus (own subprocess/JVM — job.main stops its session, so
    it must not share the test session) and writes the expected
    extraction output."""
    import json as _json
    import subprocess
    import sys as _sys

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs_df, cands_df = corpus_dfs
    jl = str(tmp_path / "docs_jsonl")
    pq = str(tmp_path / "cands_pq")
    write_documents_jsonl(docs_df.limit(50), jl)
    cands_df.write.mode("overwrite").parquet(pq)
    out_dir = str(tmp_path / "out")

    env = dict(os.environ, PYTHONPATH=ROOT)
    proc = subprocess.run(
        [_sys.executable, os.path.join(ROOT, "ocr_project_spark", "job.py"),
         "--input", jl, "--input-format", "jsonl",
         "--candidates", pq,
         "--output", out_dir, "--run-id", "jsonl-smoke",
         "--no-checkpoint", "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = _json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["docs"] == 50
    got = spark.read.parquet(f"{out_dir}/extracted")
    assert got.count() == 50
    assert got.where("status.ok").count() == 50


def test_jsonl_quarantine_survives_custom_corrupt_col_conf(spark, tmp_path):
    """A deployment that sets spark.sql.columnNameOfCorruptRecord must
    not silently break the quarantine: the reader pins the option
    explicitly to CORRUPT_COL."""
    p = tmp_path / "mixed2.jsonl"
    p.write_text(
        '{"doc_id": "good", "spans": []}\n'
        "definitely not json\n"
    )
    old = spark.conf.get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    spark.conf.set("spark.sql.columnNameOfCorruptRecord", "_custom_corrupt")
    try:
        rows = read_documents_jsonl(spark, str(p), keep_corrupt=True).collect()
    finally:
        spark.conf.set("spark.sql.columnNameOfCorruptRecord", old)
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(rows) == 2 and len(bad) == 1
    assert bad[0][CORRUPT_COL].startswith("definitely not json")


def test_orc_round_trip_preserves_extraction(spark, corpus_dfs, tmp_path):
    from ocr_project_spark.operators.extract import extract
    from ocr_project_spark.sources.formats import (
        read_documents_orc,
        write_documents_orc,
    )

    docs_df, cands_df = corpus_dfs
    path = str(tmp_path / "docs_orc")
    write_documents_orc(docs_df, path)
    docs_o = read_documents_orc(spark, path)
    assert docs_o.schema.simpleString() == docs_df.schema.simpleString()

    def key(df):
        return {
            r["doc_id"]: [tuple(s) for s in (r["spans"] or [])]
            for r in extract(df, cands_df).collect()
        }

    assert key(docs_o) == key(docs_df)


def test_orc_scan_prunes_and_pushes(spark, corpus_dfs, tmp_path):
    """The ORC native reader must keep the same scan hygiene the
    parquet path is held to: pruned ReadSchema + pushed filters."""
    import contextlib
    import io

    import pyspark.sql.functions as F
    from ocr_project_spark.sources.formats import (
        read_documents_orc,
        write_documents_orc,
    )

    docs_df, _ = corpus_dfs
    path = str(tmp_path / "docs_orc_prune")
    write_documents_orc(docs_df, path)
    q = (
        read_documents_orc(spark, path)
        .where(F.col("doc_id") == "doc-000001")
        .select("doc_id")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,doc-000001)]" in plan
    assert "spans" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_avro_absence_raises_actionable(spark, tmp_path):
    import pytest as _pytest

    from ocr_project_spark.sources.formats import read_documents_avro

    with _pytest.raises(NotImplementedError, match="spark-avro"):
        read_documents_avro(spark, str(tmp_path / "nothing.avro"))
