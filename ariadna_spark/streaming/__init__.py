"""Streaming / incremental indexing (SURVEY.md §F).

The reference is strictly one-shot batch (/root/reference/main.go:24-29);
its "incremental" story is re-import + alias swap. Our engine mirrors that
as re-running build_index on changed partitions plus a manifest swap
(sources/segments.py) — the Lucene/ES segment model, where a "stream" of
updates becomes a sequence of small builds GC'd behind the MANIFEST
pointer.

A Structured Streaming ingestion path (readStream -> foreachBatch ->
build_index(build_id=batch_id) -> publish) composes from the existing
pieces; planned for a later round once the batch engine's coverage is
complete.
"""
