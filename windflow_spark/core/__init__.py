from windflow_spark.core.graph import ExecutionMode, MultiPipe, PipeGraph, TimePolicy

__all__ = ["ExecutionMode", "MultiPipe", "PipeGraph", "TimePolicy"]
