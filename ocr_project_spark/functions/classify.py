"""Span classification as native Column expressions (JVM-side).

The new engine's stand-in for the reference's recognizer kernels
(K9-K10, /root/reference/src/advanced_ocr/engines/tesseract.py:90-208):
a Boilerpipe-style text-density + link-density block scorer.  Expressed
with built-in functions so Catalyst keeps it inside whole-stage codegen
— no Python crossing in the hot path (SURVEY.md section 4 mandate).

The rule (rules.py): content iff n_tokens >= CONTENT_MIN_TOKENS and
link_density < MAX_LINK_DENSITY.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_project_spark import rules

_WS = r"\s+"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens, matching Python ``str.split()`` semantics
    (no empty tokens from leading/trailing whitespace)."""
    return F.array_remove(F.split(F.coalesce(text, F.lit("")), _WS), "")


def n_tokens_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def link_count_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    return F.size(F.filter(toks, lambda t: t == F.lit(rules.LINK_TOKEN)))


def link_density_expr(text: Column) -> Column:
    n = n_tokens_expr(text)
    return F.when(n > 0, link_count_expr(text) / n).otherwise(F.lit(0.0))


def is_content_expr(text: Column) -> Column:
    """Boolean: the span survives boilerplate stripping."""
    n = n_tokens_expr(text)
    return (n >= F.lit(rules.CONTENT_MIN_TOKENS)) & (
        link_count_expr(text) / n < F.lit(rules.MAX_LINK_DENSITY)
    )


def word_set_expr(text: Column) -> Column:
    """Lowercased distinct word set — engine_manager.py:320-321."""
    return F.array_distinct(
        F.array_remove(F.split(F.lower(F.coalesce(text, F.lit(""))), _WS), "")
    )


def jaccard_expr(a: Column, b: Column) -> Column:
    """Word-set Jaccard similarity — engine_manager.py:314-329.

    Assumes both sides non-blank (callers gate on validity first); the
    blank branches of the reference return 0.0 / equality-test which we
    reproduce with explicit whens.
    """
    w1, w2 = word_set_expr(a), word_set_expr(b)
    inter = F.size(F.array_intersect(w1, w2))
    union = F.size(F.array_union(w1, w2))
    return (
        F.when(
            (F.coalesce(a, F.lit("")) == "") | (F.coalesce(b, F.lit("")) == ""),
            F.lit(0.0),
        )
        .when(
            (F.size(w1) == 0) | (F.size(w2) == 0),
            F.when(F.trim(a) == F.trim(b), F.lit(1.0)).otherwise(F.lit(0.0)),
        )
        .otherwise(inter / union)
    )
