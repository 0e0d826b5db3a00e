"""Exact-replay correctness check for semdedup at large sf.

The shipped DuckDB oracle (harness._SQL_SEMDEDUP) assigns vectors to
the ~sqrt(N) codebook via `e CROSS JOIN c` inside a row_number window
— at sf10 that is 200k vectors x 448 centroids ~= 90M rows each
carrying two 64-double arrays (~100 GB materialized).  The in-memory
DuckDB engine reached 113 GB RSS before being killed, and the
48 GB-capped spill run exhausted the host disk.  The ORACLE is the
bottleneck; the OPERATOR (operators/similarity.py:semdedup) assigns
via a broadcast literal codebook (narrow map, no join) and self-joins
per cluster — its Spark plan is the N^1.5/k shape the SemDeDup paper
prescribes.

This tool is the documented fallback, same class as pack_replay.py:
replay the exact semantics in numpy (float64, the same widening Spark
applies via cast to array<double>) and compare the Spark query's rows
exactly.  The output columns (vec_id, cluster, keep) are pure
int/bool, so the comparison is exact — the only float sensitivity is
the cosine-vs-threshold decision itself, and the tool prints the
minimum |cosine - threshold| margin over every examined in-cluster
pair so a borderline corpus is visible rather than silent.

Replayed semantics, mirroring the operator 1:1:
  1. identical-vector collapse to the min-id representative
     (dedup._collapse_identical); members emit keep=False with the
     representative's cluster
  2. nearest-centroid assignment: max cosine, exact ties -> lowest
     centroid index; all-zero vectors have cosine 0 everywhere and
     land in cluster 0 (assign_centroids' array_max over
     (cos, -idx) structs)
  3. domination: a representative is dropped iff a smaller-id
     representative in the SAME cluster has cosine >= threshold
  4. codebook: first ceil(sqrt(N)) vectors by vec_id (q_semdedup)

Usage: python tools/semdedup_replay.py [sf_dir]   (default /tmp/sf10)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq

THRESHOLD = 0.35
BLOCK = 2048  # rows per gram block — bounds peak memory on a skewed cluster


def _cosine_block(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """cosine(a, b) = dot / (sqrt(aa) * sqrt(bb)), 0 where a norm is 0 —
    the same formula shape as operators/similarity.cosine_expr."""
    dots = x @ y.T
    nx = np.sqrt(np.einsum("ij,ij->i", x, x))
    ny = np.sqrt(np.einsum("ij,ij->i", y, y))
    denom = nx[:, None] * ny[None, :]
    out = np.zeros_like(dots)
    np.divide(dots, denom, out=out, where=denom > 0)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl["vec_id"].to_numpy()
    emb = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    order = np.argsort(ids, kind="stable")
    ids, emb = ids[order], emb[order]
    n = len(ids)

    # 4. codebook — first ceil(sqrt(N)) vectors by vec_id
    k = math.ceil(math.sqrt(n))
    cents = emb[:k]

    # 1. identical-vector collapse (min-id representative)
    _, rep_idx, inverse = np.unique(
        emb, axis=0, return_index=True, return_inverse=True
    )
    # np.unique's return_index gives the FIRST occurrence in the sorted
    # id order -> min-id representative, matching F.min("id").
    is_rep = np.zeros(n, dtype=bool)
    is_rep[rep_idx] = True
    rep_of = rep_idx[inverse]  # position of each row's representative

    r_ids = ids[is_rep]
    r_emb = emb[is_rep]

    # 2. assignment — exact ties to the lowest centroid index
    cos = _cosine_block(r_emb, cents)
    cluster_of_rep = np.argmax(cos, axis=1)  # first max = lowest index

    # 3. per-cluster domination by any smaller-id representative
    keep = np.ones(len(r_ids), dtype=bool)
    min_margin = np.inf
    for c in np.unique(cluster_of_rep):
        sel = np.flatnonzero(cluster_of_rep == c)
        m = len(sel)
        if m < 2:
            continue
        # sel is already ascending-id (r_ids is sorted)
        xs = r_emb[sel]
        for s in range(1, m, BLOCK):
            e = min(s + BLOCK, m)
            g = _cosine_block(xs[s:e], xs[:e])
            # row i (global s+i) may only be dominated by j < s+i
            col = np.arange(e)[None, :]
            row = (s + np.arange(e - s))[:, None]
            valid = col < row
            margin = np.abs(g[valid] - THRESHOLD).min(initial=np.inf)
            min_margin = min(min_margin, margin)
            dominated = ((g >= THRESHOLD) & valid).any(axis=1)
            keep[sel[s:e]] &= ~dominated

    expected: dict[int, tuple[int, bool]] = {}
    rep_pos = {p: i for i, p in enumerate(np.flatnonzero(is_rep))}
    for row_i in range(n):
        ri = rep_pos[rep_of[row_i]]
        if is_rep[row_i]:
            expected[int(ids[row_i])] = (int(cluster_of_rep[ri]), bool(keep[ri]))
        else:
            expected[int(ids[row_i])] = (int(cluster_of_rep[ri]), False)

    from ocr_project_spark import harness
    from ocr_project_spark.session import get_spark

    spark = get_spark(
        app_name="semdedup_replay", master="local[8]", shuffle_partitions=16
    )
    got = {
        int(r["vec_id"]): (int(r["cluster"]), bool(r["keep"]))
        for r in harness.q_semdedup(spark, sf_dir).collect()
    }
    spark.stop()

    if got == expected:
        print(
            f"PASS semdedup ({len(got)} rows) exact replay at {sf_dir} "
            f"(min |cos-thr| margin {min_margin:.3e})"
        )
        sys.exit(0)
    missing = set(expected) - set(got)
    extra = set(got) - set(expected)
    diff = [i for i in expected if i in got and got[i] != expected[i]][:5]
    print(
        f"FAIL semdedup: rows spark={len(got)} replay={len(expected)}; "
        f"missing={sorted(missing)[:3]} extra={sorted(extra)[:3]} "
        f"first_diffs={[(i, got[i], expected[i]) for i in diff]} "
        f"(min margin {min_margin:.3e})"
    )
    sys.exit(1)


if __name__ == "__main__":
    main()
