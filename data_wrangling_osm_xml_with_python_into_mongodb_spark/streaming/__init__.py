from .events import read_event_stream, windowed_event_counts

__all__ = ["read_event_stream", "windowed_event_counts"]
