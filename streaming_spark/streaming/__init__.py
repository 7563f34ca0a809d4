from streaming_spark.streaming.core import (
    foreach_batch_stream,
    interval_join,
    read_events_stream,
    sessionized_counts,
    stateful_rolling_mean,
    windowed_counts,
)

__all__ = [
    "foreach_batch_stream",
    "interval_join",
    "read_events_stream",
    "sessionized_counts",
    "stateful_rolling_mean",
    "windowed_counts",
]
