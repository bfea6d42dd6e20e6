"""RuntimeContext / LocalStorage analogs (reference wf/context.hpp:54,
111-153; wf/local_storage.hpp:56).

WindFlow hands every user functor a RuntimeContext exposing the replica
index, operator parallelism, the current tuple's timestamp/watermark, and
LocalStorage (named ad-hoc per-replica state objects). The Spark mapping
splits by where user code runs:

- Column-expression land: replica index ≡ `F.spark_partition_id()`; the
  current timestamp/watermark are ordinary columns.
- Python-UDF land (mapInPandas / applyInPandas*): `pyspark.TaskContext`
  carries partition id + task attempt; per-replica scratch state is plain
  Python locals inside the UDF (one Python worker per task — exactly one
  "replica").  Durable keyed state is GroupState (streaming/persistent.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def replica_index() -> Column:
    """Column form of RuntimeContext::getReplicaIndex (wf/context.hpp:119):
    the partition a row is processed in."""
    return F.spark_partition_id()


@dataclass
class RuntimeContext:
    """UDF-side context for mapInPandas/applyInPandas bodies. Build with
    RuntimeContext.current() INSIDE the UDF (executor-side)."""

    replica: int
    attempt: int
    storage: "LocalStorage"

    @classmethod
    def current(cls) -> "RuntimeContext":
        from pyspark import TaskContext

        tc = TaskContext.get()
        return cls(
            replica=tc.partitionId() if tc else 0,
            attempt=tc.taskAttemptId() if tc else 0,
            storage=LocalStorage(),
        )


@dataclass
class LocalStorage:
    """Named ad-hoc per-replica objects (wf/local_storage.hpp:56): created
    on first access, live for the task. NOT durable and NOT keyed — for
    cross-batch durable state use the P_* operators' GroupState."""

    _objs: dict[str, Any] = field(default_factory=dict)

    def get(self, name: str, factory=dict) -> Any:
        if name not in self._objs:
            self._objs[name] = factory()
        return self._objs[name]

    def delete(self, name: str) -> bool:
        return self._objs.pop(name, None) is not None

    def is_in(self, name: str) -> bool:
        return name in self._objs
