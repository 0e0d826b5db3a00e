"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship extraction on sf0.001.
queries()     — 50 callables covering the implemented operators
                (SURVEY.md §2), implemented in
                ocr_project_spark/harness.py; every entry has an
                oracle.  Near-duplicate demos (engine-path variants,
                standalone forms of merged queries, by-design-no-oracle
                queries) live in harness.LOCAL_QUERIES and stay
                verified by tools/compare_oracle.py + pytest.
oracle_sql()  — matching DuckDB SQL strings (one per query).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ocr_project_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: boilerplate-strip extraction over derived spans of the
    sf0.001 documents table (the span-domain pipeline itself is
    exercised by pytest against the synthetic interleaved corpus)."""
    return harness.q_extract_clean_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(harness.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(harness.ORACLE_SQL)
