from rust_diskann_spark.streaming.operators import (
    ann_search_stream,
    sessionized_counts,
    streaming_dedup,
    user_running_stats,
    windowed_event_counts,
    with_event_time,
)

__all__ = [
    "ann_search_stream",
    "sessionized_counts",
    "streaming_dedup",
    "user_running_stats",
    "windowed_event_counts",
    "with_event_time",
]
