from eel_spark.streaming.streams import (
    EventStream,
    file_stream,
    foreach_batch_sink,
    rate_stream,
    rolling_parquet_stream_sink,
    session_window_agg,
    sessionize_stateful,
    sliding_window_agg,
    stream_stream_interval_join,
    streaming_dedup,
    tumbling_window_agg,
)

__all__ = [
    "EventStream",
    "file_stream",
    "foreach_batch_sink",
    "rate_stream",
    "rolling_parquet_stream_sink",
    "session_window_agg",
    "sessionize_stateful",
    "sliding_window_agg",
    "stream_stream_interval_join",
    "streaming_dedup",
    "tumbling_window_agg",
]
