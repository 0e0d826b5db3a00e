"""The engine's classification & fusion semantics — single source of truth.

Constants mirror the reference's fusion business logic exactly
(/root/reference/src/advanced_ocr/core/engine_manager.py:238-292):
validity floor 0.1, consensus confidence gate 0.7, Jaccard similarity
threshold 0.8, boost min(0.05, 0.01*n) capped at 1.0.

The text-span classifier is the Boilerpipe-style density rule the new
engine uses in place of the reference's per-pixel quality analysis
(quality_analyzer.py:51-119): a span is *content* iff it has at least
CONTENT_MIN_TOKENS whitespace tokens AND a link-marker density below
MAX_LINK_DENSITY.  Everything else is boilerplate and is stripped.

Both the pure-Python oracle (oracle.py) and the Spark expressions
(functions/classify.py, functions/fuse.py) implement these rules; tests
assert the two agree span-for-span.
"""

from __future__ import annotations

# --- text-span classification (Boilerpipe-style density rule) ---
LINK_TOKEN = "<a>"          # generator's link marker token
CONTENT_MIN_TOKENS = 8      # content spans have >= 8 tokens
MAX_LINK_DENSITY = 0.4      # content spans have < 40% link tokens

# --- media-candidate fusion (reference constants, engine_manager.py) ---
VALID_CONF = 0.1            # engine_manager.py:238-239 validity floor
CONSENSUS_CONF = 0.7        # engine_manager.py:272-273 high-confidence gate
SIM_THRESHOLD = 0.8         # engine_manager.py:274-276 Jaccard threshold
BOOST_CAP = 0.05            # engine_manager.py:284
BOOST_PER_ENGINE = 0.01     # engine_manager.py:284
CONF_CAP = 1.0              # engine_manager.py:285

# Deterministic tie-break order for equal confidence (the reference's
# sort at engine_manager.py:262 is dict-order-unstable; we pin a total
# order: confidence desc, then this priority asc, mirroring the
# engines.yaml priority list idea).
ENGINE_PRIORITY: dict[str, int] = {"rec_a": 0, "rec_b": 1, "rec_c": 2, "rec_d": 3}
DEFAULT_PRIORITY = 99


def n_tokens(text: str | None) -> int:
    if text is None:
        return 0
    return len(text.split())


def link_density(text: str | None) -> float:
    if text is None:
        return 0.0
    toks = text.split()
    if not toks:
        return 0.0
    return sum(1 for t in toks if t == LINK_TOKEN) / len(toks)


def is_content(text: str | None) -> bool:
    """The span-level boilerplate rule (pure-Python form)."""
    toks = [] if text is None else text.split()
    if len(toks) < CONTENT_MIN_TOKENS:
        return False
    links = sum(1 for t in toks if t == LINK_TOKEN)
    return links / len(toks) < MAX_LINK_DENSITY


def jaccard_words(a: str | None, b: str | None) -> float:
    """Word-set Jaccard similarity, exactly as engine_manager.py:314-329."""
    if not a or not b:
        return 0.0
    w1 = set(a.lower().split())
    w2 = set(b.lower().split())
    if not w1 or not w2:
        return 1.0 if a.strip() == b.strip() else 0.0
    return len(w1 & w2) / len(w1 | w2)


# --- K4-K6 normalization ladder (python mirror of functions/cleanup.py) ---
import re as _re

_WS = _re.compile(r"[ \t]+")
# \r (\x0d) is explicitly IN the control class (CRLF -> LF before the
# newline-run collapse); edge-strip uses the explicit ASCII class, not
# str.strip() / \s, so this mirror, functions/cleanup.py, and the DuckDB
# oracle normalize byte-for-byte identically (\s is unicode-wide in
# Python but ASCII in Java/RE2).
_CTRL = _re.compile(r"[\x00-\x08\x0b-\x1f]")
_NL_RUN = _re.compile(r"\n{3,}")
_EDGE_WS = _re.compile(r"^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$")
_ZERO_WIDTH = _re.compile("[�​‌‍﻿]")
_PUNCT_RUN = _re.compile(r"([!?.,;:])\1{2,}")


def normalize_minimal(text: str | None) -> str:
    return _EDGE_WS.sub("", _WS.sub(" ", text or ""))


def normalize_balanced(text: str | None) -> str:
    t = _CTRL.sub("", text or "")
    t = _NL_RUN.sub("\n\n", t)
    return normalize_minimal(t)


def normalize_enhanced(text: str | None) -> str:
    # removals before run-collapses — keeps the tier idempotent (see
    # functions/cleanup.py normalize_enhanced)
    t = _ZERO_WIDTH.sub("", text or "")
    t = _CTRL.sub("", t)
    t = _NL_RUN.sub("\n\n", t)
    t = _PUNCT_RUN.sub(r"\1\1", t)
    return normalize_minimal(t)


NORMALIZERS = {
    "minimal": normalize_minimal,
    "balanced": normalize_balanced,
    "enhanced": normalize_enhanced,
}


# --- K1-K3 python mirror (functions/features.py) ---
def doc_features(spans: list[dict]) -> dict:
    spans = spans or []
    toks: list[str] = []
    for s in spans:
        if s["kind"] == "text":
            toks.extend(t for t in (s["text"] or "").strip().split() if t)
    n_tok = len(toks)
    return dict(
        n_spans=len(spans),
        n_media=sum(1 for s in spans if s["kind"] == "media"),
        n_tokens=n_tok,
        diversity=(len(set(toks)) / n_tok) if n_tok else 0.0,
        link_density=(sum(1 for t in toks if t == LINK_TOKEN) / n_tok) if n_tok else 0.0,
    )


def doc_quality_score(feat: dict) -> float:
    length_score = min(1.0, feat["n_tokens"] / 200.0)
    media_ratio = feat["n_media"] / feat["n_spans"] if feat["n_spans"] else 0.0
    return (
        0.30 * length_score
        + 0.25 * feat["diversity"]
        + 0.25 * (1.0 - feat["link_density"])
        + 0.20 * (1.0 - media_ratio)
    )


def doc_strategy(spans: list[dict]) -> str:
    score = doc_quality_score(doc_features(spans))
    if score >= 0.8:
        return "minimal"
    if score >= 0.4:
        return "balanced"
    return "enhanced"
