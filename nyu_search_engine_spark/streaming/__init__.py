"""Streaming (SURVEY.md §2.9): the reference has no streaming operators —
both index build and query are batch; the crawler is concurrent-but-batch.
``incremental.py`` provides the optional Structured-Streaming ingest path
(readStream -> foreachBatch(build_partial_index)) noted there."""
