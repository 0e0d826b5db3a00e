"""Text normalization — the K4-K6 enhancement-stage analog.

The reference's enhancement ladder (minimal bilateral filter -> balanced
CLAHE -> enhanced NL-means, /root/reference/src/advanced_ocr/
preprocessing/image_enhancer.py:121-295) normalizes pixels before
recognition; the span-domain analog normalizes text before
classification.  Tiers mirror the strategy ladder (K3):

  minimal   whitespace collapse + trim
  balanced  minimal + control-char strip + newline-run collapse
            (the reference's own \\n{3,}->\\n\\n rule,
            engines/paddleocr.py:396-398)
  enhanced  balanced + strip replacement/zero-width chars + lowercase
            duplicate-punctuation squeeze

All pure `regexp_replace` column expressions — codegen'd, no Python,
trivially pushed through the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# Edge-strip uses an explicit \s regex (not F.trim, which strips ASCII
# spaces only) so the Spark, DuckDB-oracle, and pure-Python (rules.py)
# normalizers agree on \t/\n/\r-edged input.  \r (\x0d) is explicitly IN
# the balanced control-char class: CR is a control artifact the
# enhancement tier normalizes away (CRLF -> LF before the newline-run
# collapse), and all three implementations share that decision.
def normalize_minimal(text: Column) -> Column:
    t = F.regexp_replace(text, r"[ \t]+", " ")
    # explicit ASCII class, not \s: Python's \s is unicode-wide while
    # Java's and RE2's are ASCII — the class is the portable subset
    return F.regexp_replace(t, r"^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$", "")


def normalize_balanced(text: Column) -> Column:
    t = F.regexp_replace(text, r"[\x00-\x08\x0b-\x1f]", "")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")   # C3, paddleocr.py:396-398
    return normalize_minimal(t)


# Stage order makes every tier IDEMPOTENT (property-tested): character
# REMOVALS (zero-width, control) run before the run-collapses
# (newlines, punctuation, whitespace), because a removal can merge two
# short runs into a squeezable one — squeeze-before-strip left "..\r."
# squeezing to "..." only on the second pass.
def normalize_enhanced(text: Column) -> Column:
    t = F.regexp_replace(text, r"[�​‌‍﻿]", "")
    t = F.regexp_replace(t, r"[\x00-\x08\x0b-\x1f]", "")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    t = F.regexp_replace(t, r"([!?.,;:])\1{2,}", "$1$1")
    return normalize_minimal(t)


def normalize_for_strategy(text: Column, strategy: Column) -> Column:
    """Route each row through the tier its quality strategy selected —
    the per-row analog of the reference's strategy dispatch
    (pipeline.py:183-200)."""
    return (
        F.when(strategy == F.lit("minimal"), normalize_minimal(text))
        .when(strategy == F.lit("balanced"), normalize_balanced(text))
        .otherwise(normalize_enhanced(text))
    )


# Default PII patterns: portable between Java regex (Spark) and RE2
# (DuckDB oracle) — no lookaround, no backreferences.  Applied in dict
# order, each on the output of the previous replacement.  Shared by
# the corpus-level audit operator (operators/curate.scrub_pii) and the
# span-domain pipeline stage (pipeline.run_pipeline(scrub_pii=True)).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}\b",
}


def scrub_pii_text(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """Redact every PII match in a text column with its ``<NAME>``
    token — the text-rewrite core shared by the corpus operator (which
    additionally counts per-pattern redactions) and the span pipeline
    stage.  Chained ``regexp_replace``: codegen'd, no Python.  NULL
    text passes through as NULL (span text nullability is part of the
    span contract; corpus callers coalesce first)."""
    pats = PII_PATTERNS if patterns is None else patterns
    out = text
    for name, pat in pats.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out
