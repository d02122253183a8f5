from uts_spark.streaming.ops import (
    dedup_within_watermark,
    enrich_stream_static,
    interval_join_stream,
    kmv_distinct_stream,
    derivative_stateful_stream,
    derivative_tws_stream,
    read_parquet_stream,
    session_agg_stream,
    tumbling_agg_stream,
    uts_interval_agg_stream,
    with_retention_watermark,
    zscore_stream,
)

__all__ = [
    "read_parquet_stream",
    "with_retention_watermark",
    "tumbling_agg_stream",
    "session_agg_stream",
    "uts_interval_agg_stream",
    "dedup_within_watermark",
    "enrich_stream_static",
    "interval_join_stream",
    "kmv_distinct_stream",
    "zscore_stream",
    "derivative_stateful_stream",
    "derivative_tws_stream",
]
