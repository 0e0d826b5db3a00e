"""Golden-hash regression: the committed digest of the oracle's output
on the canonical fixture corpus (200 docs, seed 42).

The span-sequence equality test (test_extract.py) proves Spark == the
oracle; this test pins the oracle ITSELF, so a change to the shared
classification rules cannot silently shift both sides at once — the
analog of the reference's golden-output files
(/root/reference/results/01_simple_ocr.txt), but exact and automated.
If a rule change is intentional, regenerate with the command in the
assertion message and update GOLDEN_SHA256 in the same commit.
"""

from __future__ import annotations

import hashlib
import json

GOLDEN_SHA256 = "c443b5c9faa270ba7edcc068490cd71b9bda5cdb3709bc9c7483dea606422f1a"
GOLDEN_DOCS = 200
GOLDEN_SPANS = 1712


def test_oracle_golden_hash(corpus):
    from ocr_project_spark import oracle

    docs, cands = corpus
    out = oracle.extract_corpus(docs, cands)
    canon = json.dumps(
        {
            k: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in v]
            for k, v in sorted(out.items())
        },
        sort_keys=True,
        ensure_ascii=False,
    )
    digest = hashlib.sha256(canon.encode()).hexdigest()
    assert len(out) == GOLDEN_DOCS
    assert sum(len(v) for v in out.values()) == GOLDEN_SPANS
    assert digest == GOLDEN_SHA256, (
        "oracle output drifted; if intentional, regenerate the digest "
        "(see tests/test_golden.py docstring) and update it in the same "
        f"commit. got {digest}"
    )
