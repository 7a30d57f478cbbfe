"""Structured Streaming ingest wrappers (reference is batch-only,
SURVEY.md §2.10; provided because the same stage functions compose
directly with readStream/foreachBatch)."""
