from radohydro_spark.streaming.streams import (
    file_stream,
    foreach_batch_upsert,
    run_available_now,
    sessionize_stream,
    streaming_dedup,
    streaming_precip,
    stateful_running_total,
    stream_category_drift,
    stream_count_min,
    stream_kmv,
    stream_stream_join,
    tumbling_agg,
)

__all__ = [
    "file_stream",
    "foreach_batch_upsert",
    "run_available_now",
    "sessionize_stream",
    "streaming_dedup",
    "streaming_precip",
    "stateful_running_total",
    "stream_category_drift",
    "stream_count_min",
    "stream_kmv",
    "stream_stream_join",
    "tumbling_agg",
]
