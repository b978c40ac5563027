from etl_core_spark.streaming.stream import (
    read_stream,
    streaming_dedup,
    windowed_aggregate,
    sessionize,
    streaming_export_shards,
    streaming_psi,
    streaming_topk,
    write_stream_foreach_batch,
)

__all__ = [
    "read_stream",
    "streaming_dedup",
    "windowed_aggregate",
    "sessionize",
    "streaming_export_shards",
    "streaming_psi",
    "streaming_topk",
    "write_stream_foreach_batch",
]
