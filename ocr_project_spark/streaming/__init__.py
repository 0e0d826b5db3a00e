"""Structured Streaming surface: incremental extraction over a growing
document table.

The reference has no streaming at all (SURVEY.md section 2.10 — its
batch loop is a sequential for, /root/reference/src/advanced_ocr/
pipeline.py:111-123).  The streaming wrapper gives the 10^12-doc corpus
an ingest-as-it-lands mode: file-source readStream + foreachBatch
running the SAME batch extraction plan, with Spark's checkpoint giving
exactly-once file-level progress — complementary to the bucket
watermark tables of plans/checkpoint.py (which cover planned backfills;
this covers continuous arrival).
"""
