"""Multimodal binary-column plumbing (operators/media.py): schemas,
determinism, error capture, flatMap shape, real-codec stub gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_project_spark.operators.media import (
    decode_media,
    generate_media_table,
    media_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return generate_media_table(spark, n=80, seed=42).cache()


def test_decode_schema_and_determinism(spark, media):
    out1 = decode_media(media).collect()
    out2 = decode_media(media).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_ref = {r["media_ref"]: r for r in out1}
    assert len(by_ref) == 80
    ok = [r for r in out1 if r["ok"]]
    assert len(ok) == 80
    assert all(64 <= r["width"] <= 1024 and 64 <= r["height"] <= 604 for r in ok)
    assert all(1 <= r["n_frames"] <= 30 for r in ok)


def test_decode_error_capture(spark):
    bad = spark.createDataFrame(
        [("media://x/0", None, "image/png"), ("media://x/1", b"", "image/png")],
        "media_ref string, payload binary, mime string",
    )
    rows = {r["media_ref"]: r for r in decode_media(bad).collect()}
    assert not rows["media://x/0"]["ok"] and rows["media://x/0"]["error"]
    assert not rows["media://x/1"]["ok"]


def test_real_codec_is_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|not installed|real media"):
        decode_media(media, codec="real").collect()


def test_features_shape(media):
    rows = media_features(media).collect()
    assert len(rows) == 80
    for r in rows:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9
        assert 0.0 <= r["byte_entropy"] <= 4.0  # 16-bin entropy bound


def test_frame_sampling_bounds(media):
    frames = sample_frames(media, every_k=7, max_frames=4)
    per_ref = frames.groupBy("media_ref").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(1 <= r["n"] <= 4 for r in per_ref)
    rows = frames.collect()
    assert all(len(bytes(r["frame_payload"])) >= 1 for r in rows)
    assert all(r["frame_idx"] % 7 == 0 for r in rows)


def test_no_shuffle_in_media_plan(media):
    plan = decode_media(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow pipeline: scan -> mapInPandas
