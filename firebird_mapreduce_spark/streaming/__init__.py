"""Structured Streaming twins of the batch operators.

The reference is batch-only (input is a fixed array,
``/root/reference/firebird.h:167-170``); streaming is a north-star
capability.  The selling point is batch-stream parity: the same DataFrame
transformations run unchanged over ``readStream`` sources.
"""

from .jobs import (
    group_count_stream,
    run_stream_to_memory,
    session_window_stream,
    stream_events,
    stream_events_multibatch,
    stream_stream_join,
    streaming_dedup,
    tumbling_window_stream,
    user_running_counts_stream,
)

__all__ = [
    "stream_events",
    "stream_events_multibatch",
    "group_count_stream",
    "tumbling_window_stream",
    "session_window_stream",
    "user_running_counts_stream",
    "streaming_dedup",
    "stream_stream_join",
    "run_stream_to_memory",
]
