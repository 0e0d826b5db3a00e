"""approx_count_distinct vocabulary statistic: within HLL++ error of
the exact oracle (functions/text.distinct_token_count)."""

from __future__ import annotations


def test_approx_distinct_tokens_within_rsd(spark, corpus_dfs):
    from pyspark.sql import functions as F

    from ocr_project_spark.functions.text import distinct_token_count

    docs_df, _ = corpus_dfs
    flat = docs_df.select(
        F.array_join(
            F.transform(F.coalesce(F.col("spans"), F.array()),
                        lambda s: F.coalesce(s["text"], F.lit(""))),
            " ",
        ).alias("text")
    )
    rsd = 0.02
    exact = distinct_token_count(flat, approximate=False).collect()[0][0]
    approx = distinct_token_count(flat, rsd=rsd).collect()[0][0]
    assert exact > 0
    # HLL++ guarantees stddev ~ rsd; allow 4 sigma
    assert abs(approx - exact) / exact <= 4 * rsd, (approx, exact)
