"""Tile a driver-generated sf directory K-fold into a larger synthetic
scale factor (e.g. sf0.1 x 10 -> sf1) for scale-up measurement.

The driver ships sf{0.001,0.01,0.1} read-only; anything bigger has to
be synthesized locally.  Plain replication would be wrong for the
content tables — 10 identical copies of every document turn EVERY
5-gram into a cross-doc duplicate and every embedding into an exact
near-dup, so dedup/scrub queries would degenerate into their
documented worst cases for an artificial reason.  Instead each replica
is made disjoint where content identity matters:

* relational tables (customer/supplier/part/orders/lineitem/events):
  key columns are offset by ``replica * stride`` with stride = the
  next power of ten above the base max key, preserving every FK
  relationship inside a replica (region/nation stay shared dims);
* documents: doc_id offset + every token suffixed with a replica tag
  (``x<r>q``), so each replica's n-gram space is disjoint — duplicate
  /passage structure per replica matches the base corpus exactly.
  n_chars is recomputed.  Tradeoffs, documented for the bench notes:
  vocabulary grows linearly with K (a real crawl grows sublinearly,
  Heaps' law — vocabulary-keyed aggregates see an upper-bound load)
  and replica>0 tokens stop matching English stopword lists (filter
  OUTCOMES shift; per-doc filter COST does not);
* embeddings: vec_id offset + the vector rolled by ``replica``
  positions (norm-preserving; a rolled vector is ~orthogonal to its
  source, so per-replica cluster structure matches the base).

Usage: python tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SHARED_DIMS = ["region", "nation"]
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# key columns must share one stride per ENTITY so FKs keep matching
ENTITY_OF = {
    "c_custkey": "customer", "o_custkey": "customer",
    "s_suppkey": "supplier", "l_suppkey": "supplier",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "orders", "l_orderkey": "orders",
    "event_id": "event", "user_id": "user",
}
ENTITY_BASE = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
}


def _stride(con: duckdb.DuckDBPyConnection, src: str, table: str, col: str) -> int:
    mx = con.execute(
        f"SELECT max({col}) FROM '{src}/{table}.parquet'"
    ).fetchone()[0]
    return 10 ** int(math.ceil(math.log10(int(mx) + 2)))


def make_sf(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    # the K-way UNION ALL parses K levels deep; the default cap is 1000,
    # which k=1000 (sf100) exceeds
    con.execute(f"SET max_expression_depth TO {max(1000, 4 * k)}")

    strides = {
        ent: _stride(con, src, table, col)
        for ent, (table, col) in ENTITY_BASE.items()
    }

    for t in SHARED_DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    def _rg(table: str) -> int:
        # row groups are the atomic scan-split unit (README input-layout
        # rule): bound rows-per-group so every generated table carries
        # >= 64 of them — DuckDB's default 122 880-row groups gave
        # sf10's 500k-doc table 5 groups and capped every scan (and,
        # through per-stage persists, whole jobs) at 5 tasks.  Capped
        # at the 122 880 default so groups only ever SHRINK: without
        # the min, a 60M-row table would get 937k-row groups and scan
        # NARROWER (64 splits) than the default layout (~489).
        n = con.execute(
            f"SELECT count(*) FROM '{src}/{table}.parquet'"
        ).fetchone()[0]
        return max(2048, min(122_880, (n * k) // 64))

    for t, keys in KEYED.items():
        parts = []
        for r in range(k):
            sel = ", ".join(
                f"{c} + {r * strides[ENTITY_OF[c]]} AS {c}" if c in keys else c
                for c in [
                    row[0]
                    for row in con.execute(
                        f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
                    ).fetchall()
                ]
            )
            parts.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {_rg(t)})"
        )

    # documents: disjoint n-gram space per replica
    doc_stride = _stride(con, src, "documents", "doc_id")
    parts = []
    for r in range(k):
        if r == 0:
            parts.append(f"SELECT * FROM '{src}/documents.parquet'")
        else:
            parts.append(
                f"SELECT doc_id + {r * doc_stride} AS doc_id, "
                f"regexp_replace(text, '([A-Za-z0-9]+)', '\\1x{r}q', 'g') AS text, "
                f"lang, source, "
                f"CAST(length(regexp_replace(text, '([A-Za-z0-9]+)', '\\1x{r}q', 'g')) AS BIGINT) AS n_chars "
                f"FROM '{src}/documents.parquet'"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) "
        f"TO '{dst}/documents.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {_rg('documents')})"
    )

    # embeddings: rolled vectors, offset ids (numpy: list ops are easier
    # and exactly reproducible here)
    emb = pq.read_table(f"{src}/embeddings.parquet")
    vec_stride = 10 ** int(
        math.ceil(math.log10(int(pa.compute.max(emb["vec_id"]).as_py()) + 2))
    )
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)
    labels = np.array(emb["label"].to_pylist(), dtype=np.int32)
    out_ids, out_vecs, out_labels = [], [], []
    for r in range(k):
        out_ids.append(ids + r * vec_stride)
        out_vecs.append(np.roll(vecs, r, axis=1))
        out_labels.append(labels)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in np.concatenate(out_vecs)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(out_labels), pa.int32()),
        }
    )
    pq.write_table(
        tbl,
        f"{dst}/embeddings.parquet",
        row_group_size=max(2048, min(122_880, len(tbl) // 64)),
    )
    print(f"wrote {dst} = {src} x {k}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_sf(src, dst, k)
