from windflow_spark.plans.explain import (
    physical_plan,
    pushed_filters,
    scan_read_schema,
    has_broadcast_join,
    shuffle_count,
    codegen_stage_count,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast_join",
    "shuffle_count",
    "codegen_stage_count",
]
