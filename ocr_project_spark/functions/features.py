"""K1-K3 analog over the span domain: per-document features -> quality
score -> processing strategy, as pure HOF column expressions.

Mirrors the reference's quality-analysis loop: 13 pixel metrics
(/root/reference/src/advanced_ocr/preprocessing/quality_analyzer.py:
51-119) reduce to a weighted score (:261-281) that recommends a
strategy (:306-313, >=0.8 minimal / >=0.4 balanced / else enhanced).
Span-domain features: token volume, vocabulary diversity, link-marker
density, media ratio — the Boilerpipe-style document statistics.

python mirror: rules.doc_features / rules.doc_strategy (kept in
lockstep by tests/test_pipeline_compose.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_project_spark import rules


def _all_tokens(spans: Column) -> Column:
    """Whitespace tokens of every text span, flattened."""
    text_spans = F.filter(
        F.coalesce(spans, F.array()), lambda s: s["kind"] == F.lit("text")
    )
    toks = F.flatten(
        F.transform(
            text_spans,
            lambda s: F.split(F.trim(F.coalesce(s["text"], F.lit(""))), r"\s+"),
        )
    )
    return F.filter(toks, lambda t: t != F.lit(""))


def doc_features_expr(spans: Column) -> Column:
    """struct(n_spans, n_media, n_tokens, diversity, link_density)."""
    sp = F.coalesce(spans, F.array())
    toks = _all_tokens(spans)
    n_tok = F.size(toks)
    n_links = F.size(F.filter(toks, lambda t: t == F.lit(rules.LINK_TOKEN)))
    return F.struct(
        F.size(sp).alias("n_spans"),
        F.size(F.filter(sp, lambda s: s["kind"] == F.lit("media"))).alias("n_media"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok)
        .otherwise(F.lit(0.0))
        .alias("diversity"),
        F.when(n_tok > 0, n_links / n_tok).otherwise(F.lit(0.0)).alias("link_density"),
    )


def quality_score_expr(feat: Column) -> Column:
    """Weighted score, the 0.30/0.25/0.25/0.20 ladder of
    quality_analyzer.py:261-281 transposed to span features."""
    length_score = F.least(F.lit(1.0), feat["n_tokens"] / F.lit(200.0))
    media_ratio = F.when(
        feat["n_spans"] > 0, feat["n_media"] / feat["n_spans"]
    ).otherwise(F.lit(0.0))
    return (
        0.30 * length_score
        + 0.25 * feat["diversity"]
        + 0.25 * (F.lit(1.0) - feat["link_density"])
        + 0.20 * (F.lit(1.0) - media_ratio)
    )


def strategy_expr(score: Column) -> Column:
    """K3 recommender thresholds (quality_analyzer.py:306-313)."""
    return (
        F.when(score >= 0.8, "minimal")
        .when(score >= 0.4, "balanced")
        .otherwise("enhanced")
    )


def improvement_expr(spans_before: Column, spans_after: Column) -> Column:
    """K7 improvement measurement (image_enhancer.py:297-334: the
    reference re-runs its quality metrics on the enhanced image and
    reports the delta).  Span-domain analog: quality score of the
    normalized output spans minus the score of the pre-normalization
    spans — a pure-expression lineage column, no extra pass over data.
    """
    before = quality_score_expr(doc_features_expr(spans_before))
    after = quality_score_expr(doc_features_expr(spans_after))
    return F.struct(
        F.round(before, 6).alias("q_before"),
        F.round(after, 6).alias("q_after"),
        F.round(after - before, 6).alias("q_delta"),
    )
