"""Structured Streaming extension (batch reference has no streams —
SURVEY.md §2.10; this is the §7 step 8 north-star path)."""

from chess_lakehouse_spark.streaming.jobs import (
    corpus_ingest_clean,
    hourly_event_counts,
    incremental_dedup_batch,
    url_dedup_batch,
    read_documents_stream,
    read_events_stream,
    run_available_now,
    stream_corpus_to_jsonl_shards,
    running_user_counts,
    session_windows,
    sliding_event_counts,
    phash_dedup_batch,
    span_dedup_batch,
    stream_incremental_dedup,
    stream_phash_dedup,
    stream_span_dedup,
    stream_url_dedup,
    streaming_dedup,
)

__all__ = [
    "stream_incremental_dedup",
    "stream_phash_dedup",
    "stream_span_dedup",
    "stream_url_dedup",
    "span_dedup_batch",
    "phash_dedup_batch",
    "incremental_dedup_batch",
    "url_dedup_batch",
    "corpus_ingest_clean",
    "hourly_event_counts",
    "read_documents_stream",
    "read_events_stream",
    "run_available_now",
    "stream_corpus_to_jsonl_shards",
    "running_user_counts",
    "session_windows",
    "sliding_event_counts",
    "streaming_dedup",
]
