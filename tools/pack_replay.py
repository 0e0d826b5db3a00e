"""Exact-replay correctness check for pack_sequences at large sf.

The shipped DuckDB oracle (harness._SQL_PACK) expresses greedy
first-fit packing as a recursive CTE; DuckDB re-scans the full working
set per recursion step, so the ORACLE is O(n_docs^2) — fine at the
driver gate's sf0.01 (500 docs), hours at sf1+ (the OPERATOR itself is
a linear streaming kernel; greedy packing is order-dependent by
definition, so no set-based SQL exists).  This tool is the documented
fallback (BASELINE.md "Round-4 scale-up gate"): tokenize with DuckDB
(linear), replay the greedy pack in Python, and compare the Spark
query's rows exactly.

Usage: python tools/pack_replay.py [sf_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"

    from ocr_project_spark import harness
    from ocr_project_spark.session import get_spark

    # linear half of the oracle: token counts per doc, doc_id order
    toks = harness._WORD_TOKS.format(c="text")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, CAST(len({toks}) AS BIGINT) FROM "
        f"'{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    # greedy first-fit replay — same semantics as the recursive CTE
    # and as operators/pack._pack_bounds over one global partition
    budget = 500
    expected: dict[str, tuple[int, str]] = {}
    pack, acc = 0, 0
    for doc_id, n in rows:
        if acc + n > budget and acc > 0:
            pack, acc = pack + 1, 0
        acc += n
        expected[doc_id] = (n, f"0-{pack}")

    spark = get_spark(
        app_name="pack_replay", master="local[8]", shuffle_partitions=16
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"])
        for r in harness.q_pack_sequences(spark, sf_dir).collect()
    }
    spark.stop()

    if got == expected:
        print(f"PASS pack_sequences ({len(got)} rows) exact replay at {sf_dir}")
        sys.exit(0)
    missing = set(expected) - set(got)
    extra = set(got) - set(expected)
    diff = [k for k in expected if k in got and got[k] != expected[k]][:5]
    print(
        f"FAIL pack_sequences: rows spark={len(got)} replay={len(expected)}; "
        f"missing={list(missing)[:3]} extra={list(extra)[:3]} "
        f"first_diffs={[(k, got[k], expected[k]) for k in diff]}"
    )
    sys.exit(1)


if __name__ == "__main__":
    main()
