"""Structured Streaming forms of the WindFlow operator surface.

Batch forms (windflow_spark.operators) define the semantics and are
oracle-checked; these streaming forms produce the same results on the same
data (tested via availableNow triggers against the batch plans — the
metamorphic batch≡streaming invariant, SURVEY.md §5).
"""

from windflow_spark.streaming.sources import file_stream, rate_stream, kafka_stream
from windflow_spark.streaming.ops import (
    streaming_tumbling_window_tb,
    streaming_sliding_window_tb,
    streaming_session_window,
    streaming_interval_join,
    streaming_interval_join_bucketed,
    streaming_rolling_reduce,
    streaming_tumbling_window_cb,
    streaming_sliding_window_cb,
    cb_eos_punctuations,
    streaming_exact_dedup,
    streaming_static_enrich,
    ordered_foreach_batch,
    streaming_kslack,
    streaming_cohort_retention,
    streaming_ewma,
    streaming_holt,
    streaming_ohlc,
    streaming_transitions,
    streaming_forward_fill,
    streaming_scd2,
    streaming_trending_counts,
    streaming_alert_hysteresis,
    streaming_debounce,
    streaming_funnel,
    streaming_heavy_hitters,
    streaming_cms,
    streaming_rolling_zscore,
    streaming_segment_dedup,
    streaming_weighted_sample,
)
from windflow_spark.streaming.sinks import (
    to_memory_sink,
    to_parquet_sink,
    to_foreach_batch,
    kafka_sink,
    run_available_now,
    on_query_terminated,
)
from windflow_spark.streaming.state import rocksdb_state_conf
from windflow_spark.streaming.persistent import p_map, p_filter, p_flatmap, p_reduce
from windflow_spark.streaming.monitor import StreamMonitor, monitor_streams

__all__ = [
    "file_stream",
    "rate_stream",
    "kafka_stream",
    "streaming_tumbling_window_tb",
    "streaming_sliding_window_tb",
    "streaming_session_window",
    "streaming_interval_join",
    "streaming_interval_join_bucketed",
    "streaming_rolling_reduce",
    "streaming_tumbling_window_cb",
    "streaming_sliding_window_cb",
    "cb_eos_punctuations",
    "streaming_exact_dedup",
    "streaming_static_enrich",
    "to_memory_sink",
    "to_parquet_sink",
    "to_foreach_batch",
    "kafka_sink",
    "run_available_now",
    "on_query_terminated",
    "rocksdb_state_conf",
    "p_map",
    "p_filter",
    "p_flatmap",
    "p_reduce",
    "StreamMonitor",
    "monitor_streams",
    "ordered_foreach_batch",
    "streaming_kslack",
    "streaming_cohort_retention",
    "streaming_ewma",
    "streaming_holt",
    "streaming_ohlc",
    "streaming_transitions",
    "streaming_forward_fill",
    "streaming_scd2",
    "streaming_trending_counts",
    "streaming_alert_hysteresis",
    "streaming_debounce",
    "streaming_funnel",
    "streaming_heavy_hitters",
    "streaming_cms",
    "streaming_weighted_sample",
    "streaming_rolling_zscore",
    "streaming_segment_dedup",
]
