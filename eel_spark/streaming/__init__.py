from eel_spark.streaming.streams import (
    EventStream,
    file_stream,
    rate_stream,
    rolling_parquet_stream_sink,
    session_window_agg,
    sessionize_stateful,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "EventStream",
    "file_stream",
    "rate_stream",
    "rolling_parquet_stream_sink",
    "session_window_agg",
    "sessionize_stateful",
    "sliding_window_agg",
    "tumbling_window_agg",
]
