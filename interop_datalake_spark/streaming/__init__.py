from interop_datalake_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stream_static_join,
    streaming_dedup,
    tumbling_window_agg,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "streaming_dedup",
    "stream_static_join",
]
