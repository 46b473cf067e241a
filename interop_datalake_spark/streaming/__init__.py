from interop_datalake_spark.streaming.txn_source import (
    TxnTableDataSource,
    read_txn_stream,
    register_txn_source,
)
from interop_datalake_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stream_static_join,
    streaming_dedup,
    tumbling_window_agg,
)

__all__ = [
    "TxnTableDataSource",
    "read_txn_stream",
    "register_txn_source",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "streaming_dedup",
    "stream_static_join",
]
