"""Cross-engine identity of the aggregate result hash (tools/agg_hash.py).

The sf100 oracle gate compares (count, sum(md5_lower64),
sum(md5_upper64)) computed independently by Spark and DuckDB over
identically-canonicalised rows.  These tests pin the two properties
the gate rests on:

1. IDENTITY — both engines produce the same triple on the same rows,
   including the adversarial values where engine formatting diverges:
   NULLs, NaN, +/-Infinity, -0.0, exact 4th-decimal ties (0.03125 =
   1/32 — JVM printf rounds HALF_UP, C printf half-even; the canon
   ladder sidesteps printf there), integral doubles, floats off the
   1e-4 grid, giant magnitudes that overflow BIGINT casts, strings
   containing the field separator, and empty results.
2. SENSITIVITY — any single mutated value, swapped column pair, or
   dropped/duplicated row changes the triple.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import agg_hash  # noqa: E402


def spark_triple(spark, rows, schema_ddl):
    df = spark.createDataFrame(rows, schema=schema_ddl)
    canon = agg_hash.spark_canon_expr(df.schema)
    assert canon is not None
    digest, aggs = agg_hash.spark_agg_exprs(canon)
    n, lo, hi = df.selectExpr(digest).selectExpr(*aggs).collect()[0]
    return int(n), int(lo), int(hi)


def duck_triple(sql):
    con = duckdb.connect()
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    canon = agg_hash.duck_canon_expr(desc)
    assert canon is not None
    n, lo, hi = con.execute(agg_hash.duck_agg_sql(canon, sql)).fetchone()
    return int(n), int(lo), int(hi)


TRICKY_ROWS = [
    (1, "plain", 0.5, True),
    (2, None, None, None),
    (3, "sep\x1finside", float("nan"), False),
    (4, "", float("inf"), True),
    (5, "neg", float("-inf"), False),
    (6, "intish", 3.0, True),
    (7, "negzero", -0.0, True),
    (8, "tie", 0.03125, False),        # exact tie at the 4th decimal
    (9, "negtie", -0.03125, False),
    (10, "offgrid", 0.1 + 0.2, True),  # 0.30000000000000004
    (11, "big", 9.0e14 + 0.0625, False),
    (12, "huge", 1.0e20, True),
    (13, "tiny", 1.0e-9, False),
    (14, "negint", -42.0, True),
]
SPARK_SCHEMA = "id bigint, s string, d double, b boolean"
DUCK_VALUES = """
SELECT * FROM (VALUES
  (1::BIGINT, 'plain', 0.5::DOUBLE, true),
  (2, NULL, NULL, NULL),
  (3, 'sep' || chr(31) || 'inside', 'nan'::DOUBLE, false),
  (4, '', 'inf'::DOUBLE, true),
  (5, 'neg', '-inf'::DOUBLE, false),
  (6, 'intish', 3.0, true),
  (7, 'negzero', -0.0, true),
  (8, 'tie', 0.03125, false),
  (9, 'negtie', -0.03125, false),
  (10, 'offgrid', 0.1::DOUBLE + 0.2::DOUBLE, true),
  (11, 'big', 9.0e14 + 0.0625, false),
  (12, 'huge', 1.0e20, true),
  (13, 'tiny', 1.0e-9, false),
  (14, 'negint', -42.0, true)
) AS t(id, s, d, b)
"""


def test_identity_on_adversarial_values(spark):
    assert spark_triple(spark, TRICKY_ROWS, SPARK_SCHEMA) == duck_triple(
        DUCK_VALUES)


def test_identity_on_empty_result(spark):
    st = spark_triple(spark, [], SPARK_SCHEMA)
    dt = duck_triple(DUCK_VALUES + " WHERE id < 0")
    assert st == dt == (0, 0, 0)


def test_sensitivity_to_value_row_and_column_changes(spark):
    base = spark_triple(spark, TRICKY_ROWS, SPARK_SCHEMA)
    mutated = [r if r[0] != 8 else (8, "tie", 0.03135, False)
               for r in TRICKY_ROWS]
    assert spark_triple(spark, mutated, SPARK_SCHEMA) != base
    assert spark_triple(spark, TRICKY_ROWS[:-1], SPARK_SCHEMA) != base
    dup = TRICKY_ROWS + [TRICKY_ROWS[0]]
    assert spark_triple(spark, dup, SPARK_SCHEMA) != base
    swapped = [(r[0], "x" if r[1] is None else None if r[0] == 2 else r[1],
                r[2], r[3]) for r in TRICKY_ROWS]
    assert spark_triple(spark, swapped, SPARK_SCHEMA) != base


def test_row_order_insensitive(spark):
    assert spark_triple(spark, list(reversed(TRICKY_ROWS)),
                        SPARK_SCHEMA) == spark_triple(
        spark, TRICKY_ROWS, SPARK_SCHEMA)


def test_unsupported_schema_falls_back(spark):
    df = spark.createDataFrame([(1, [1, 2])], schema="id bigint, a array<int>")
    assert agg_hash.spark_canon_expr(df.schema) is None
    con = duckdb.connect()
    desc = con.execute("DESCRIBE SELECT [1,2] AS a").fetchall()
    assert agg_hash.duck_canon_expr(desc) is None


def test_canon_matches_python_canon_on_grid(spark):
    """On the 1e-4 score grid the engine canon agrees with the collect
    path's Python canon() — the two modes give the same verdict on the
    values the queries actually emit."""
    from compare_oracle import canon

    vals = [0.0, 1.0, -1.0, 0.1234, -0.1234, 2.5, 123.4567, -99.9999,
            3.0, 1e-4, 42.0]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, schema="i bigint, d double")
    expr = agg_hash.spark_canon_expr(df.schema)
    got = {r[0] for r in df.selectExpr(f"{expr} AS c").collect()}
    want = {f"{canon(float(v))}\x1f{canon(i)}" for i, v in rows}
    assert got == want
