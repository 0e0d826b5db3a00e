"""Deterministic synthetic interleaved-document generator (FIXTURES.md).

The span-domain transposition of the reference's only fixture recipe —
the synthetic degraded-document generator at
/root/reference/tests/test_preprocessing.py:428-460 (clean canvas +
injected defects).  Here the "canvas" is a clean content-span sequence
and the "defects" are injected boilerplate spans, media spans with noisy
candidate recognitions, shuffled storage order, unicode and whitespace
garbage.

Everything is seeded per-document (seed = base_seed + doc index) so any
subset of documents is reproducible independently of corpus size — a
requirement for distributed generation at scale.

Spark-free (pure numpy/python + pyarrow writer) so the pytest oracle can
run without a SparkSession.
"""

from __future__ import annotations

import numpy as np

from ocr_project_spark import rules

CONTENT_VOCAB = (
    "data table query engine scan filter join merge sort hash spark span "
    "column row batch stream window group order value index plan stage task "
    "shuffle bucket salt partition document text media fusion confidence"
).split()

NAV_VOCAB = "home about contact login menu next prev footer nav sitemap".split()

CAPTION_VOCAB = "figure chart photo diagram picture logo banner icon".split()

ENGINES = list(rules.ENGINE_PRIORITY)


def _content_span_text(rng: np.random.Generator) -> str:
    n = int(rng.integers(10, 41))
    toks = list(rng.choice(CONTENT_VOCAB, size=n))
    # content spans may carry a few links, always below the density rule
    n_links = int(rng.integers(0, max(1, n // 6)))  # <= ~17% < 40%
    for pos in rng.choice(n, size=n_links, replace=False):
        toks[int(pos)] = rules.LINK_TOKEN
    return " ".join(toks)


def _boilerplate_span_text(rng: np.random.Generator) -> str:
    style = rng.integers(0, 3)
    if style == 0:  # short nav — fails the min-token rule
        n = int(rng.integers(1, 6))
        return " ".join(rng.choice(NAV_VOCAB, size=n))
    if style == 1:  # link farm — fails the link-density rule
        n = int(rng.integers(8, 15))
        toks = list(rng.choice(NAV_VOCAB, size=n))
        n_links = int(np.ceil(n * 0.6)) + 1
        for pos in rng.choice(n, size=min(n_links, n), replace=False):
            toks[int(pos)] = rules.LINK_TOKEN
        return " ".join(toks)
    # whitespace / unicode garbage — fails trim/min-token
    return rng.choice(["", "   ", "\t\n", "   ", "©  ®"])


def _media_candidates(
    rng: np.random.Generator, doc_id: str, offset: int, caption: str
) -> list[dict]:
    """3-5 candidate recognitions whose fused winner is deterministic.

    Mirrors the per-engine result dict of engine_manager.py:144-165.
    A minority of spans exercise the edge paths: all-invalid (fallback
    best-of-failed), single-candidate, and tie-confidence candidates.
    """
    scenario = rng.integers(0, 10)
    true_text = " ".join(rng.choice(CONTENT_VOCAB, size=int(rng.integers(4, 9))))
    cands: list[dict] = []
    if scenario == 0:  # all invalid -> fallback best-of-failed
        for e in rng.permutation(ENGINES)[: int(rng.integers(2, 5))]:
            bad = rng.choice(["", "  "]) if rng.random() < 0.5 else true_text
            conf = float(rng.uniform(0.0, 0.1)) if bad == true_text else float(rng.uniform(0.0, 0.9))
            cands.append(dict(engine=str(e), text=str(bad) if bad != true_text else true_text, confidence=round(conf, 4)))
        # ensure at least one truly invalid-but-nonblank low-conf row
        cands.append(dict(engine="rec_d", text=true_text, confidence=0.05))
    elif scenario == 1:  # single candidate
        cands.append(dict(engine=str(rng.choice(ENGINES)), text=true_text, confidence=round(float(rng.uniform(0.2, 0.99)), 4)))
    elif scenario == 2:  # tie confidence -> engine-priority tie-break
        conf = round(float(rng.uniform(0.75, 0.95)), 4)
        for e in ENGINES[:3]:
            cands.append(dict(engine=e, text=true_text + f" variant {e}", confidence=conf))
    else:  # normal: agreeing majority + one dissenter
        n = int(rng.integers(3, 6))
        engines = list(rng.permutation(ENGINES))[:n] + (["rec_a", "rec_b"][: max(0, n - len(ENGINES))])
        for i, e in enumerate(engines[:n]):
            if i == n - 1:
                cands.append(dict(engine=str(e), text=" ".join(rng.choice(NAV_VOCAB, size=5)), confidence=round(float(rng.uniform(0.2, 0.69)), 4)))
            else:
                # same word set, shuffled order -> Jaccard 1.0 > 0.8
                words = true_text.split()
                cands.append(dict(engine=str(e), text=" ".join(rng.permutation(words)), confidence=round(float(rng.uniform(0.71, 0.99)), 4)))
    for c in cands:
        c["doc_id"] = doc_id
        c["offset"] = offset
    return cands


def generate_corpus(
    n_docs: int = 200,
    base_seed: int = 42,
    mega_doc_every: int = 97,
    mega_span_count: int = 400,
) -> tuple[list[dict], list[dict]]:
    """Return (documents, candidates).

    documents: [{doc_id, spans: [{kind,text,media_ref,offset}, ...]}]
    candidates: [{doc_id, offset, engine, text, confidence}]

    Edge cases injected at fixed indices (FIXTURES.md section 1): empty
    doc, all-boilerplate doc, single-span doc, mega-doc, duplicate
    offsets, shuffled storage order.

    ``mega_span_count`` sizes the periodic mega-doc (default 400 — the
    fixture contract).  The skewed-corpus benchmark raises it to
    ~100x the regular P99 (12000) to reproduce the one-straggler-task
    regime that motivates chunk_documents + AQE skew splitting.
    """
    docs: list[dict] = []
    cands: list[dict] = []
    for i in range(n_docs):
        rng = np.random.default_rng(base_seed + i)
        doc_id = f"doc-{i:06d}"
        if i % 53 == 7:  # empty doc
            docs.append(dict(doc_id=doc_id, spans=[]))
            continue
        if i % 53 == 19:  # all-boilerplate -> empty output
            spans = [
                dict(kind="text", text=_boilerplate_span_text(rng), media_ref="", offset=k)
                for k in range(int(rng.integers(2, 6)))
            ]
            docs.append(dict(doc_id=doc_id, spans=spans))
            continue
        if i % 53 == 31:  # single-span doc
            docs.append(
                dict(
                    doc_id=doc_id,
                    spans=[dict(kind="text", text=_content_span_text(rng), media_ref="", offset=0)],
                )
            )
            continue

        n_spans = mega_span_count if (i % mega_doc_every == 50) else int(
            np.clip(rng.lognormal(2.2, 0.8), 3, 120)
        )
        spans = []
        for k in range(int(n_spans)):
            r = rng.random()
            if r < 0.15:  # media span
                caption = " ".join(rng.choice(CAPTION_VOCAB, size=int(rng.integers(1, 4))))
                media_ref = f"media://{doc_id}/{k}"
                spans.append(dict(kind="media", text=caption, media_ref=media_ref, offset=k))
                if rng.random() < 0.9:  # 10% of media spans have no candidates
                    cands.extend(_media_candidates(rng, doc_id, k, caption))
            elif r < 0.55:
                spans.append(dict(kind="text", text=_content_span_text(rng), media_ref="", offset=k))
            else:
                spans.append(dict(kind="text", text=_boilerplate_span_text(rng), media_ref="", offset=k))
        # duplicate-offset edge case on some docs: clone one span's offset
        if i % 41 == 3 and len(spans) >= 2:
            spans[1] = dict(spans[1], offset=spans[0]["offset"])
        # storage order is NOT document order: shuffle the array
        order = rng.permutation(len(spans))
        spans = [spans[int(j)] for j in order]
        docs.append(dict(doc_id=doc_id, spans=spans))
    return docs, cands


def write_corpus_parquet(
    out_dir: str,
    n_docs: int = 200,
    base_seed: int = 42,
    mega_doc_every: int = 97,
    mega_span_count: int = 400,
) -> tuple[str, str]:
    """Write documents_spans.parquet + media_candidates.parquet with pyarrow."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs, cands = generate_corpus(
        n_docs=n_docs,
        base_seed=base_seed,
        mega_doc_every=mega_doc_every,
        mega_span_count=mega_span_count,
    )
    os.makedirs(out_dir, exist_ok=True)

    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    doc_tbl = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "spans": pa.array([d["spans"] for d in docs], pa.list_(span_t)),
        }
    )
    doc_path = os.path.join(out_dir, "documents_spans.parquet")
    pq.write_table(doc_tbl, doc_path)

    cand_tbl = pa.table(
        {
            "doc_id": pa.array([c["doc_id"] for c in cands], pa.string()),
            "offset": pa.array([c["offset"] for c in cands], pa.int32()),
            "engine": pa.array([c["engine"] for c in cands], pa.string()),
            "text": pa.array([c["text"] for c in cands], pa.string()),
            "confidence": pa.array([c["confidence"] for c in cands], pa.float64()),
        }
    )
    cand_path = os.path.join(out_dir, "media_candidates.parquet")
    pq.write_table(cand_tbl, cand_path)
    return doc_path, cand_path


def write_mega_corpus_parquet(
    out_dir: str,
    mega_span_count: int = 4_000_000,
    n_regular: int = 50,
    base_seed: int = 47,
) -> tuple[str, str]:
    """Write a corpus whose skew is ONE document: a single mega doc of
    ``mega_span_count`` spans next to ``n_regular`` ordinary docs.

    This is the extract_chunked crossover fixture (PLANS.md "mega-doc
    crossover bench"): plain extract() leaves the mega doc as a single
    task's serial expression work — the regime where per-document
    assembly time exceeds a task's useful work quantum and intra-doc
    chunking starts paying for its two extra shuffles.  generate_corpus
    builds spans one Python dict at a time (fine at its fixture sizes,
    ~10 min at 4M spans), so the mega doc here is built columnar:
    texts are drawn from a seeded 1024-string pool per style and
    assembled directly into arrow arrays.  Deterministic for a given
    (mega_span_count, n_regular, base_seed).

    Media spans are thinned to 2% with exactly one 0.9-confidence
    candidate each — enough to exercise the fusion join + map lookup
    on every chunk without the candidate table itself becoming the
    fixture's cost center.  Storage order is shuffled (the untrusted-
    order contract, FIXTURES.md) so the chunker's sort actually works.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(base_seed)
    mega_id = "doc-mega-000000"

    # seeded text pools (vectorized draw; pool size swamps any
    # distribution artifact at 4M draws)
    content_pool = [_content_span_text(rng) for _ in range(1024)]
    boiler_pool = [_boilerplate_span_text(rng) for _ in range(1024)]
    caption_pool = [
        " ".join(rng.choice(CAPTION_VOCAB, size=int(rng.integers(1, 4))))
        for _ in range(256)
    ]

    n = int(mega_span_count)
    r = rng.random(n)
    is_media = r < 0.02
    is_content = (~is_media) & (r < 0.55)
    pool_idx = rng.integers(0, 1024, size=n)
    cap_idx = rng.integers(0, 256, size=n)

    texts: list[str] = [None] * n  # type: ignore[list-item]
    media_refs: list[str] = [""] * n
    for k in np.flatnonzero(is_media):
        k = int(k)
        texts[k] = caption_pool[int(cap_idx[k])]
        media_refs[k] = f"media://{mega_id}/{k}"
    for k in np.flatnonzero(is_content):
        k = int(k)
        texts[k] = content_pool[int(pool_idx[k])]
    for k in np.flatnonzero(~is_media & ~is_content):
        k = int(k)
        texts[k] = boiler_pool[int(pool_idx[k])]

    kinds = np.where(is_media, "media", "text").tolist()
    # storage order != document order: stored slot j holds the span
    # whose document position is perm[j], and offset carries that
    # document position — so a stable (offset, idx) sort recovers
    # document order, same contract as generate_corpus.
    perm = rng.permutation(n)
    span_struct = pa.StructArray.from_arrays(
        [
            pa.array([kinds[int(j)] for j in perm], pa.string()),
            pa.array([texts[int(j)] for j in perm], pa.string()),
            pa.array([media_refs[int(j)] for j in perm], pa.string()),
            pa.array(perm.astype("int32"), pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    mega_list = pa.ListArray.from_arrays(
        pa.array([0, n], pa.int32()), span_struct
    )

    # regular companion docs via the standard generator (no mega)
    docs, cands = generate_corpus(
        n_docs=n_regular, base_seed=base_seed + 1, mega_doc_every=10**9
    )
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    reg_tbl = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "spans": pa.array([d["spans"] for d in docs], pa.list_(span_t)),
        }
    )
    mega_tbl = pa.table(
        {
            "doc_id": pa.array([mega_id], pa.string()),
            "spans": mega_list.cast(pa.list_(span_t)),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    doc_path = os.path.join(out_dir, "documents_spans.parquet")
    pq.write_table(pa.concat_tables([mega_tbl, reg_tbl]), doc_path)

    # one deterministic candidate per mega media span (vectorized)
    media_pos = np.flatnonzero(is_media)
    engines = ENGINES * (len(media_pos) // len(ENGINES) + 1)
    cand_cols = {
        "doc_id": [mega_id] * len(media_pos),
        "offset": [int(k) for k in media_pos],
        "engine": engines[: len(media_pos)],
        "text": [texts[int(k)] for k in media_pos],
        "confidence": [0.9] * len(media_pos),
    }
    cand_tbl = pa.table(
        {
            "doc_id": pa.array(
                cand_cols["doc_id"] + [c["doc_id"] for c in cands], pa.string()
            ),
            "offset": pa.array(
                cand_cols["offset"] + [c["offset"] for c in cands], pa.int32()
            ),
            "engine": pa.array(
                cand_cols["engine"] + [c["engine"] for c in cands], pa.string()
            ),
            "text": pa.array(
                cand_cols["text"] + [c["text"] for c in cands], pa.string()
            ),
            "confidence": pa.array(
                cand_cols["confidence"] + [c["confidence"] for c in cands],
                pa.float64(),
            ),
        }
    )
    cand_path = os.path.join(out_dir, "media_candidates.parquet")
    pq.write_table(cand_tbl, cand_path)
    return doc_path, cand_path
