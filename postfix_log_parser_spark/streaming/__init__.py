"""Structured Streaming twin of the batch pipeline (SURVEY.md §2 A1-A3).

``read_text_stream`` → ``prepare_stream`` → ``parse_lines(passthrough=…)``
→ ``sessionize_stream`` is the streaming mirror of
``read_text`` → ``parse_lines`` → ``sessionize``.
"""

from postfix_log_parser_spark.streaming.sessionize_stream import (
    STREAM_OUT_SCHEMA,
    prepare_stream,
    sessionize_stream,
    stream_events,
    stream_faults,
    stream_pre_faults,
)

__all__ = [
    "STREAM_OUT_SCHEMA",
    "prepare_stream",
    "sessionize_stream",
    "stream_events",
    "stream_faults",
    "stream_pre_faults",
]
