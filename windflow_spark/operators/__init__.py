"""Operator layer: WindFlow's operator inventory re-expressed as DataFrame
transforms (SURVEY.md §2). Each function takes and returns DataFrames; all
run distributed (no collect, no driver-side state)."""

from windflow_spark.operators.windows import (
    tumbling_window_tb,
    sliding_window_tb,
    tumbling_window_cb,
    sliding_window_cb,
    paned_window_tb,
    window_spine_tb,
)
from windflow_spark.operators.reduce import rolling_reduce
from windflow_spark.operators.interval_join import interval_join
from windflow_spark.operators.routing import merge_pipes, split_pipe
from windflow_spark.operators.kslack import kslack_reorder

__all__ = [
    "kslack_reorder",
    "tumbling_window_tb",
    "sliding_window_tb",
    "tumbling_window_cb",
    "sliding_window_cb",
    "paned_window_tb",
    "window_spine_tb",
    "rolling_reduce",
    "interval_join",
    "merge_pipes",
    "split_pipe",
]
