"""Tracked persist() handles for operators that cache intermediates.

Several operators persist a corpus- or vocabulary-scale intermediate
because two or more branches of the returned plan consume it
(lm_score's bigram table, dsir_weights' feature vectors,
scrub_passages' window table, semdedup's assigned vectors, bm25's
postings when ``persist_index=True``).  The persist is load-bearing —
without it the scan→tokenize→aggregate lineage executes once per
consuming branch — but Spark has no scope-exit hook, so the operator
cannot unpersist before the caller's action runs the plan.

This module is the release valve: every operator-internal persist is
registered here under the operator's tag, and a long-lived driver
(a notebook, a service, curate_job-style pipelines) releases the
cached tables after the consuming action:

    from ocr_project_spark import caching
    weights = dsir_weights(docs, target)      # persists under "dsir_weights"
    weights.write.parquet(out)                # the consuming action
    caching.release("dsir_weights")           # drop the cached tables

Short-lived jobs can ignore this entirely — the persists die with the
session — and ``release_all()`` is the blunt end-of-stage instrument.
Storage level is MEMORY_AND_DISK for everything registered here:
these tables are vocabulary/corpus-scale, and at web scale an
evicted-partition recompute re-runs a corpus pass while a disk spill
costs one local read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: dict[str, list[DataFrame]] = {}


def track(df: DataFrame, tag: str) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register the handle under
    ``tag`` so :func:`release` can unpersist it later.  Returns the
    persisted DataFrame."""
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE.setdefault(tag, []).append(out)
    return out


def release(tag: str, blocking: bool = False) -> int:
    """Unpersist every DataFrame registered under ``tag``; returns how
    many handles were released.  Safe to call on an unknown tag."""
    handles = _LIVE.pop(tag, [])
    for df in handles:
        df.unpersist(blocking=blocking)
    return len(handles)


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame across all tags."""
    return sum(release(tag, blocking=blocking) for tag in list(_LIVE))


def live_tags() -> dict[str, int]:
    """Snapshot of currently-tracked tags -> handle counts (for
    diagnostics and tests)."""
    return {tag: len(handles) for tag, handles in _LIVE.items()}
