from .events import (
    read_event_stream, windowed_event_weights, run_stream_to_memory,
)

__all__ = [
    "read_event_stream", "windowed_event_weights", "run_stream_to_memory",
]
