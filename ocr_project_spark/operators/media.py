"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payload columns plus typed metadata,
processed by Arrow-batched ``mapInPandas`` stages — the distributed
analog of the reference's per-image pixel kernels
(/root/reference/src/advanced_ocr/preprocessing/image_enhancer.py,
utils/images.py:29-43).  The actual codec work (cv2/PIL/ffmpeg) is NOT
available in this environment, so the decode step is stubbed two ways:

* ``decode_media`` with ``codec="real"`` raises NotImplementedError at
  the exact place a cv2.imdecode call belongs;
* ``codec="fake"`` (default, used by every test) derives deterministic
  pseudo-metadata and pseudo-pixels from the payload bytes, so the
  Spark-side contract — schema, batch shape, partitioning, iterator
  UDF lifecycle, null handling — is fully real and tested.

Scale notes: payloads never pass through a shuffle (all stages are
narrow mapInPandas over the scan); metadata-only outputs drop the
payload column as early as possible (column pruning keeps the binary
out of downstream exchanges); per-batch size is bounded by Arrow
``maxRecordsPerBatch`` (session.py) so a partition of 100 MB images
streams through the Python worker in bounded memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_ref string, payload binary, mime string"
)

DECODED_SCHEMA = (
    "media_ref string, mime string, width int, height int, n_frames int, "
    "ok boolean, error string"
)

FEATURES_SCHEMA = "media_ref string, byte_entropy double, mean_byte double, features array<double>"

FRAMES_SCHEMA = "media_ref string, frame_idx int, frame_payload binary"


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: dims derived from payload bytes."""
    if not payload:
        raise ValueError("empty payload")
    h = int.from_bytes(payload[:4].ljust(4, b"\0"), "little")
    return 64 + h % 960, 64 + (h >> 10) % 540, 1 + (h >> 20) % 30


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """payload -> typed metadata (width/height/frames) with per-row
    error capture (the never-fail contract of engine_manager.py:132-142:
    bad rows become ok=false rows, the job continues).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # lazy per-worker init point: a real codec would load libraries
        # here, once per python worker (iterator-UDF form).
        if codec == "real":
            raise NotImplementedError(
                "real media decoding requires cv2/PIL which are not "
                "installed in this environment; use codec='fake'"
            )
        for pdf in batches:
            rows = []
            for ref, payload, mime in zip(
                pdf["media_ref"], pdf["payload"], pdf["mime"]
            ):
                try:
                    w, h, nf = _fake_dims(bytes(payload) if payload is not None else b"")
                    rows.append((ref, mime, w, h, nf, True, None))
                except Exception as e:  # noqa: BLE001 — never-fail contract
                    rows.append((ref, mime, None, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "mime", "width", "height", "n_frames", "ok", "error",
                ],
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


def media_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Vectorized byte-level features per payload: entropy, mean byte,
    and an n_bins byte histogram (normalized) — the stand-in for real
    embedding extraction, with the identical Spark shape (binary in,
    array<double> out, no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, ents, means, feats = [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                refs.append(ref)
                if buf.size == 0:
                    ents.append(0.0), means.append(0.0)
                    feats.append([0.0] * n_bins)
                    continue
                hist = np.bincount(buf >> 4 if n_bins == 16 else buf % n_bins,
                                   minlength=n_bins).astype(float)
                p = hist / hist.sum()
                nz = p[p > 0]
                ents.append(float(-(nz * np.log2(nz)).sum()))
                means.append(float(buf.mean()))
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame(
                {"media_ref": refs, "byte_entropy": ents,
                 "mean_byte": means, "features": feats}
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 7, max_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: emit up to max_frames deterministic
    byte-slices per payload (1 row in -> N rows out, a flatMap shape).
    A real implementation swaps the slicing for ffmpeg keyframe pulls;
    the row-explosion plumbing and bounded output are identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, payloads = [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                buf = bytes(payload or b"")
                if not buf:
                    continue
                _, _, nf = _fake_dims(buf)
                chunk = max(1, len(buf) // max(nf, 1))
                for i, f in enumerate(range(0, nf, every_k)):
                    if i >= max_frames:
                        break
                    refs.append(ref)
                    idxs.append(f)
                    payloads.append(buf[f * chunk : (f + 1) * chunk] or buf[:1])
            yield pd.DataFrame(
                {"media_ref": refs,
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_payload": payloads}
            )

    return media.mapInPandas(run, FRAMES_SCHEMA)


def generate_media_table(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media payloads (seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = [
        (
            f"media://doc-{i:06d}/{i % 7}",
            rng.bytes(int(rng.integers(16, 4096))),
            ["image/png", "image/jpeg", "video/mp4", "audio/wav"][i % 4],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
