"""Error taxonomy for the distributed engine.

The reference defines a driver-visible exception hierarchy
(/root/reference/src/advanced_ocr/exceptions.py:26-155).  In the batch
engine that taxonomy splits in two, because at 10^12 documents per-item
failures must NEVER raise:

* **Per-document failures are DATA, not exceptions** — the never-fail
  status contract (operators/extract.doc_status_expr): each reason
  string below names a structural failure mode that becomes a
  ``status.reason`` value on an error row.  ``REASON_INFO`` is the
  registry tying those rows back to a taxonomy a user can dispatch on.

* **Driver-side setup failures still raise** — a bad config file,
  an unknown classifier, a checkpoint conflict abort the JOB before any
  distributed work starts, matching the reference's
  ConfigurationError / EngineNotAvailableError semantics.
"""

from __future__ import annotations


class ExtractionError(Exception):
    """Root of the engine's driver-side error taxonomy
    (reference OCRLibraryError, exceptions.py:26-37)."""


class ConfigurationError(ExtractionError, ValueError):
    """Bad/missing config layer or override (reference
    exceptions.py:72-84).  Also a ValueError so pre-taxonomy callers
    catching ValueError keep working."""


class ClassifierNotAvailableError(ExtractionError, KeyError):
    """Unknown or disabled classifier/engine requested (reference
    EngineNotAvailableError, exceptions.py:40-54).  Also a KeyError to
    keep the registry-lookup convention."""


class CheckpointConflictError(ExtractionError):
    """A resume targets an output root whose watermark table belongs to
    a different run configuration (no reference analog — the reference
    has no restart story)."""


# --- per-document status reasons (never raised; see module docstring) ---
REASON_NULL_DOC_ID = "null_doc_id"
REASON_NULL_SPANS = "null_spans"
REASON_MALFORMED_SPAN = "malformed_span"

REASON_INFO: dict[str, dict] = {
    REASON_NULL_DOC_ID: dict(
        category="validation",
        retriable=False,
        description="document has no identity; cannot join candidates "
        "or deduplicate (reference ValidationError tier)",
    ),
    REASON_NULL_SPANS: dict(
        category="validation",
        retriable=False,
        description="spans column is NULL (absent payload, distinct "
        "from an empty document)",
    ),
    REASON_MALFORMED_SPAN: dict(
        category="processing",
        retriable=False,
        description="a span lacks offset/kind, so assembly cannot sort "
        "or classify it (reference ImageProcessingError tier)",
    ),
}
