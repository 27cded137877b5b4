"""Structured Streaming extension (SURVEY §2.9 / §7 M7)."""

from .pipeline import (  # noqa: F401
    read_event_stream,
    session_rollup,
    stream_asof_enrich,
    stream_dedup,
    stream_maintain_reflection,
    stream_neardup_filter,
    stream_stream_join,
    stream_to_table,
    stream_upsert_to_table,
    upsert_stream_batch,
    tumbling_rollup,
    sliding_rollup,
    running_user_totals,
)
