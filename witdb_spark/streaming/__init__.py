from witdb_spark.streaming.ops import (
    stream_dedup,
    stream_events_from_dir,
    windowed_event_counts,
)

__all__ = ["stream_events_from_dir", "windowed_event_counts", "stream_dedup"]
