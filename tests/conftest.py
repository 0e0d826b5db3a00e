from __future__ import annotations

import pytest

from ocr_project_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from ocr_project_spark.sources.generate import generate_corpus

    return generate_corpus(n_docs=200, base_seed=42)


@pytest.fixture(scope="session")
def corpus_dfs(spark, corpus, tmp_path_factory):
    """Corpus written to parquet and read back — exercises the real
    storage round-trip, not createDataFrame shortcuts."""
    from ocr_project_spark.sources.generate import write_corpus_parquet

    out = str(tmp_path_factory.mktemp("fixture_corpus"))
    doc_path, cand_path = write_corpus_parquet(out, n_docs=200, base_seed=42)
    return spark.read.parquet(doc_path), spark.read.parquet(cand_path)
