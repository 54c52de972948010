from .events import (
    EVENTS_STREAM_SCHEMA, read_event_stream, windowed_event_weights,
    run_stream_to_memory,
)

__all__ = [
    "EVENTS_STREAM_SCHEMA", "read_event_stream", "windowed_event_weights",
    "run_stream_to_memory",
]
