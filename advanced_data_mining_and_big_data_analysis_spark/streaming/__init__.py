from .windows import (
    session_agg,
    sliding_agg,
    stateful_running_totals,
    stateful_session_expiry,
    stream_from_directory,
    stream_stream_join,
    streaming_cms,
    streaming_dedup,
    tumbling_agg,
    write_cdc_snapshot,
    write_dedup_ingest,
    write_foreach_batch_parquet,
)

__all__ = [
    "session_agg",
    "sliding_agg",
    "stateful_running_totals",
    "stateful_session_expiry",
    "stream_from_directory",
    "stream_stream_join",
    "streaming_cms",
    "streaming_dedup",
    "tumbling_agg",
    "write_cdc_snapshot",
    "write_dedup_ingest",
    "write_foreach_batch_parquet",
]
