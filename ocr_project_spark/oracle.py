"""Pure-Python reference extractor — the pytest ground truth.

Implements the engine's semantics (rules.py) with naive loops, the way
the reference library does one document at a time
(/root/reference/src/advanced_ocr/pipeline.py:63-96).  Tests assert
span-sequence equality (kind, text, media_ref, order) between this
oracle and the distributed Spark pipeline on every fixture document —
the automated analog of the reference's golden-output files
(/root/reference/results/01_simple_ocr.txt).

Fusion semantics follow engine_manager.py:219-312 exactly:
  1. valid = non-blank text AND confidence > 0.1          (:238-239)
  2. no valid -> best-of-failed by max confidence          (:241-246)
  3. one valid -> it                                       (:248-252)
  4. else: best by confidence (tie: engine priority), consensus =
     best + every other valid with conf > 0.7 and word-Jaccard > 0.8;
     if |consensus| > 1: conf = min(1, avg + min(0.05, 0.01*n))  (:262-292)
"""

from __future__ import annotations

from collections import defaultdict

from ocr_project_spark import rules


def fuse_candidates(
    cands: list[dict], early_termination: float | None = None
) -> dict | None:
    """Fuse one media span's candidate rows -> winner dict or None.

    ``early_termination`` mirrors the reference's high-confidence
    short-circuit (types.py:181-182, advanced_usage.py:200-220): if the
    best valid candidate clears the threshold it wins as-is, skipping
    the consensus stage entirely.
    """
    if not cands:
        return None

    def sort_key(c):
        return (
            -c["confidence"],
            rules.ENGINE_PRIORITY.get(c["engine"], rules.DEFAULT_PRIORITY),
            c["engine"],
            c["text"] or "",
        )

    valid = [
        c
        for c in cands
        if (c["text"] or "").strip() and c["confidence"] > rules.VALID_CONF
    ]
    if (
        early_termination is not None
        and valid
        and max(c["confidence"] for c in valid) >= early_termination
    ):
        best = min(valid, key=sort_key)
        return dict(
            text=best["text"],
            confidence=best["confidence"],
            method="early_termination",
            n_consensus=1,
        )
    if not valid:
        best = min(cands, key=sort_key)
        return dict(
            text=best["text"],
            confidence=best["confidence"],
            method="fallback_best_of_failed",
            n_consensus=0,
        )
    if len(valid) == 1:
        c = valid[0]
        return dict(
            text=c["text"],
            confidence=c["confidence"],
            method="single_valid",
            n_consensus=1,
        )
    ordered = sorted(valid, key=sort_key)
    best = ordered[0]
    consensus = [best["confidence"]]
    for c in ordered[1:]:
        if c["confidence"] > rules.CONSENSUS_CONF:
            if rules.jaccard_words(best["text"], c["text"]) > rules.SIM_THRESHOLD:
                consensus.append(c["confidence"])
    if len(consensus) > 1:
        avg = sum(consensus) / len(consensus)
        boost = min(rules.BOOST_CAP, rules.BOOST_PER_ENGINE * len(consensus))
        conf = min(rules.CONF_CAP, avg + boost)
        method = f"consensus_{len(consensus)}_engines"
    else:
        conf = best["confidence"]
        method = "best_single"
    return dict(
        text=best["text"], confidence=conf, method=method, n_consensus=len(consensus)
    )


def doc_status(doc: dict) -> tuple[bool, str | None]:
    """Never-fail input validation (mirror of
    operators/extract.doc_status_expr): (ok, reason).  The reference's
    per-item error-result contract (pipeline.py:286-309,
    engine_manager.py:132-142) — a bad document becomes an error row,
    never a dropped row or a failed batch."""
    if doc.get("doc_id") is None:
        return False, "null_doc_id"
    if doc.get("spans") is None:
        return False, "null_spans"
    for s in doc["spans"]:
        if s is None or s.get("offset") is None or s.get("kind") is None:
            return False, "malformed_span"
    return True, None


def extract_document(
    doc: dict, cands_by_key: dict | None = None, normalize: str | None = None
) -> dict:
    """Extract one document -> {doc_id, spans: [(kind,text,media_ref,order)]}.

    Pipeline: stable-sort spans by (offset, storage index) -> resolve
    media spans through fusion -> strip boilerplate text spans -> dense
    re-rank ``order``.
    """
    ok, reason = doc_status(doc)
    if not ok:
        return dict(doc_id=doc.get("doc_id"), spans=[], status=(ok, reason))
    cands_by_key = cands_by_key or {}
    indexed = sorted(
        enumerate(doc["spans"] or []), key=lambda p: (p[1]["offset"], p[0])
    )
    out = []
    for _, s in indexed:
        if s["kind"] == "media":
            fused = fuse_candidates(cands_by_key.get((doc["doc_id"], s["offset"]), []))
            text = fused["text"] if fused is not None else s["text"]
            out.append(dict(kind="media", text=text, media_ref=s["media_ref"]))
        else:
            if rules.is_content(s["text"]):
                out.append(dict(kind="text", text=s["text"], media_ref=s["media_ref"]))
    if normalize == "auto":
        norm = rules.NORMALIZERS[rules.doc_strategy(doc["spans"] or [])]
    elif normalize:
        norm = rules.NORMALIZERS[normalize]
    else:
        norm = lambda t: t  # noqa: E731
    return dict(
        doc_id=doc["doc_id"],
        spans=[
            dict(kind=s["kind"], text=norm(s["text"]), media_ref=s["media_ref"], order=i)
            for i, s in enumerate(out)
        ],
        status=(True, None),
    )


def extract_corpus(
    docs: list[dict], cands: list[dict], normalize: str | None = None
) -> dict[str, list[dict]]:
    """Extract every document -> {doc_id: [out spans]}."""
    by_key: dict = defaultdict(list)
    for c in cands:
        by_key[(c["doc_id"], c["offset"])].append(c)
    return {
        d["doc_id"]: extract_document(d, by_key, normalize)["spans"] for d in docs
    }
