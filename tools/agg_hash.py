"""Engine-side order-insensitive result hashing for the oracle gate.

The collect-and-compare path in compare_oracle.py is exact but
driver-bound: at sf100 the largest spot-gate outputs are ~26M rows,
and materialising BOTH engines' result sets as Python tuples (plus the
sorted canonical-line lists hash_rows builds) is tens of GB of driver
heap spent on *verification*, not computation — the precise
anti-pattern the engine itself avoids.  This module moves the
comparison into the engines: each side canonicalises every result row
to the same string, md5s it, and reduces to

    (row_count, sum(md5_lower64), sum(md5_upper64))

where lower64/upper64 are the little-endian halves of the digest —
DuckDB's built-in ``md5_number_lower/upper`` semantics, reproduced on
the Spark side with ``conv`` over byte-reversed hex substrings.  Two
independent 64-bit sums over 128-bit digests make a silent cancel
(wrong rows whose hash sums happen to agree) a ~2^-128 event.  The
result crossing the driver is three numbers per engine, so the compare
is O(1) driver memory at any scale.

Canonicalisation mirrors compare_oracle.canon() by construction where
it matters (NULL -> 'NULL', integral doubles -> integer string,
fractional doubles -> fixed 4 decimals) but only needs to be
IDENTICAL BETWEEN THE TWO ENGINES, not identical to Python: the agg
verdict compares Spark-agg vs DuckDB-agg, never agg vs collect.  Ties
at the 4th decimal are therefore resolved half-away-from-zero via
``floor(abs(x)*1e4 + 0.5)`` on both sides instead of trusting printf,
whose tie rounding differs between the JVM (HALF_UP) and C
(half-even); printf is used only for |x| >= 9e14 where every
representable double's 4-decimal expansion is exact and tie-free.

Supported column types: integers, strings, booleans, float/double.
Anything else (arrays, structs, timestamps, decimals) returns None and
the caller falls back to the collect path — the big spot-gate outputs
are all flat primitive rows, which is the case this exists for.
"""

from __future__ import annotations

SEP = "\x1f"

# column-type buckets shared by both builders
_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
_INT_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def _canon_double(cd: str, *, str_t: str, div: str, printf: str) -> str:
    """Shared CASE ladder for a double expression ``cd`` (pre-cast)."""
    m = f"CAST(floor(abs({cd}) * 10000.0 + 0.5) AS BIGINT)"
    return (
        f"CASE WHEN {cd} IS NULL THEN 'NULL' "
        f"WHEN isnan({cd}) THEN 'NaN' "
        f"WHEN {cd} = CAST('Infinity' AS DOUBLE) THEN 'Infinity' "
        f"WHEN {cd} = CAST('-Infinity' AS DOUBLE) THEN '-Infinity' "
        f"WHEN abs({cd}) < 9e14 THEN ("
        f"  CASE WHEN {cd} = CAST({cd} AS BIGINT) "
        f"       THEN CAST(CAST({cd} AS BIGINT) AS {str_t}) "
        f"       ELSE concat("
        f"         CASE WHEN {cd} < 0 THEN '-' ELSE '' END, "
        f"         CAST({m} {div} 10000 AS {str_t}), '.', "
        f"         lpad(CAST({m} % 10000 AS {str_t}), 4, '0')) "
        f"  END) "
        f"ELSE {printf}('%.4f', {cd}) END"
    )


def spark_canon_expr(schema) -> str | None:
    """Canonical-row SQL expression for a Spark DataFrame schema.

    Returns a single string expression (sorted-column order, SEP-joined)
    or None if any column type is unsupported.
    """
    parts = []
    for f in sorted(schema.fields, key=lambda f: f.name):
        c = f"`{f.name}`"
        t = f.dataType.simpleString()
        if t in _INT_SPARK:
            parts.append(
                f"CASE WHEN {c} IS NULL THEN 'NULL' "
                f"ELSE CAST({c} AS STRING) END")
        elif t == "string":
            parts.append(f"CASE WHEN {c} IS NULL THEN 'NULL' ELSE {c} END")
        elif t == "boolean":
            parts.append(
                f"CASE WHEN {c} IS NULL THEN 'NULL' "
                f"ELSE CAST(CAST({c} AS INT) AS STRING) END")
        elif t in ("double", "float"):
            parts.append(_canon_double(
                f"CAST({c} AS DOUBLE)",
                str_t="STRING", div="DIV", printf="format_string"))
        else:
            return None
    joiner = f", '{SEP}', ".join(parts) if len(parts) > 1 else parts[0]
    return f"concat({joiner})" if len(parts) > 1 else parts[0]


def duck_canon_expr(described: list[tuple]) -> str | None:
    """Canonical-row SQL expression from DuckDB DESCRIBE rows."""
    cols = [(r[0], r[1]) for r in described]
    parts = []
    for name, t in sorted(cols, key=lambda x: x[0]):
        c = f'"{name}"'
        base = t.split("(")[0].upper()
        if base in _INT_DUCK:
            parts.append(
                f"CASE WHEN {c} IS NULL THEN 'NULL' "
                f"ELSE CAST({c} AS VARCHAR) END")
        elif base == "VARCHAR":
            parts.append(f"CASE WHEN {c} IS NULL THEN 'NULL' ELSE {c} END")
        elif base == "BOOLEAN":
            parts.append(
                f"CASE WHEN {c} IS NULL THEN 'NULL' "
                f"ELSE CAST(CAST({c} AS INT) AS VARCHAR) END")
        elif base in ("DOUBLE", "FLOAT", "REAL"):
            parts.append(_canon_double(
                f"CAST({c} AS DOUBLE)",
                str_t="VARCHAR", div="//", printf="printf"))
        else:
            return None
    joiner = f", '{SEP}', ".join(parts) if len(parts) > 1 else parts[0]
    return f"concat({joiner})" if len(parts) > 1 else parts[0]


# Spark reconstruction of DuckDB's md5_number_lower/upper: the hex
# digest's byte pairs reversed within each 8-byte half (little-endian),
# parsed as unsigned 64-bit via conv, summed as DECIMAL(38,0) so 26M
# rows of ~2^64 values cannot overflow (sum < 2^89 << 10^38).
def _le_hex(h: str, start: int) -> str:
    pairs = [f"substring({h},{p},2)" for p in range(start + 14, start - 1, -2)]
    return "concat(" + ",".join(pairs) + ")"


def spark_agg_exprs(canon: str) -> tuple[str, list[str]]:
    """(digest selectExpr, [three aggregate selectExprs])."""
    lo = f"CAST(conv({_le_hex('h', 17)}, 16, 10) AS DECIMAL(38,0))"
    hi = f"CAST(conv({_le_hex('h', 1)}, 16, 10) AS DECIMAL(38,0))"
    return (
        f"md5({canon}) AS h",
        [
            "count(*) AS n",
            f"coalesce(sum({lo}), 0) AS lo",
            f"coalesce(sum({hi}), 0) AS hi",
        ],
    )


def duck_agg_sql(canon: str, oracle_sql: str) -> str:
    return (
        "SELECT count(*) AS n, "
        "coalesce(sum(md5_number_lower(c)), 0) AS lo, "
        "coalesce(sum(md5_number_upper(c)), 0) AS hi "
        f"FROM (SELECT {canon} AS c FROM ({oracle_sql}) _o) _c"
    )
