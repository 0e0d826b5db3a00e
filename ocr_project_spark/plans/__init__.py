"""Physical-plan policy: partitioning, salting, checkpointing, metrics.

The reference has no physical planning at all — one Python process, a
thread pool of width min(4, n_engines)
(/root/reference/src/advanced_ocr/core/engine_manager.py:171).  At
10^12-document scale the plan IS the product; these modules make the
north_rule's operational clauses (hash(doc_id) partitioning, salting for
skewed mega-documents, resumable per-partition watermarks, lineage and
metrics) explicit and testable.
"""
