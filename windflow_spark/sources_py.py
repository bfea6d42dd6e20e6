"""Python DataSource V2: a deterministic synthetic-events source.

The reference ships user-extensible sources (wf/source.hpp — any functor
can be a Source; wf/kafka/kafka_source.hpp is the packaged example). Spark
4's Python DataSource API is the matching extension surface on this side:
a pure-Python class registered once, then driven through the normal
`spark.read.format(...)` / `spark.readStream.format(...)` planner paths —
partitioned scans, predicate pushdown, and micro-batch offsets included.

This module provides `synthetic_events`, a generator source used to
exercise that surface end-to-end (tests/test_python_datasource.py):

- **Deterministic**: every row derives from md5(event_id) — identical
  output on any executor count, partitioning, or re-read (the registry's
  no-RAND() rule applied to a source).
- **Partitioned**: the id range splits into `numPartitions` tasks; each
  task generates only its slice (no driver materialization, no skew).
- **Filter pushdown**: range predicates on `event_id` prune the generated
  range BEFORE any row exists — the Python-source analog of parquet
  row-group skipping (pushFilters returns the residual filters Spark must
  still apply).
- **Streaming**: the same rows exposed through micro-batch offsets
  (SimpleDataSourceStreamReader), `rowsPerBatch` ids per trigger, so
  `availableNow` replays the exact batch frame — the EOS-bounded replay
  contract of streaming/sources.file_stream, from a generator instead of
  files.

Options: numRows (default 1000), numUsers (100), numPartitions (4),
startUs (0), stepUs (1_000_000), rowsPerBatch (250, streaming only).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("us", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _row(i: int, n_users: int, start_us: int, step_us: int) -> tuple:
    h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
    return (
        i,
        start_us + i * step_us,
        h % n_users,
        _EVENT_TYPES[(h >> 8) % len(_EVENT_TYPES)],
        ((h >> 16) % 1_000_000) / 1e4,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("numRows", 1000))
        self.n_users = int(options.get("numUsers", 100))
        self.n_parts = int(options.get("numPartitions", 4))
        self.start_us = int(options.get("startUs", 0))
        self.step_us = int(options.get("stepUs", 1_000_000))
        self.lo = 0
        self.hi = self.n_rows

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Fold range predicates on event_id into the generated id range —
        pruning happens before any row is created. Everything else is
        returned as residual for Spark to evaluate."""
        for f in filters:
            col = getattr(f, "attribute", None)
            handled = False
            if col == ("event_id",):
                v = getattr(f, "value", None)
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                    handled = True
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                    handled = True
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                    handled = True
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                    handled = True
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
                    handled = True
            if not handled:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_parts)
        span = max(1, (hi - lo + n - 1) // n)
        parts = []
        s = lo
        while s < hi:
            parts.append(_RangePartition(s, min(s + span, hi)))
            s += span
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, self.n_users, self.start_us, self.step_us)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("numRows", 1000))
        self.n_users = int(options.get("numUsers", 100))
        self.start_us = int(options.get("startUs", 0))
        self.step_us = int(options.get("stepUs", 1_000_000))
        self.per_batch = int(options.get("rowsPerBatch", 250))

    def initialOffset(self) -> dict:  # noqa: N802
        return {"next": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["next"])
        hi = min(lo + self.per_batch, self.n_rows)
        # a LIST, not a generator: the simple-reader protocol prefetches
        # on the driver and ships the rows pickled
        rows = [
            _row(i, self.n_users, self.start_us, self.step_us)
            for i in range(lo, hi)
        ]
        return (rows, {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay is exact: the same deterministic rows for the same range
        for i in range(int(start["next"]), int(end["next"])):
            yield _row(i, self.n_users, self.start_us, self.step_us)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """`spark.dataSource.register(SyntheticEventsDataSource)` then
    `spark.read.format("synthetic_events").option("numRows", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticReader(self.options)

    def simpleStreamReader(  # noqa: N802
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return _SyntheticStreamReader(self.options)


# ---------------------------------------------------------------------------
# Python DataSource writer: manifest-committed JSONL sink
# ---------------------------------------------------------------------------

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartCommit(WriterCommitMessage):
    path: str
    n_rows: int


class _JsonlWriter(DataSourceWriter):
    """Task side: each task writes its partition to a uniquely-named temp
    part file and returns (path, row count). Driver side: commit renames
    the parts into place and writes a `_MANIFEST.json` listing every
    committed file + total rows — readers that trust only manifest-listed
    files get all-or-nothing visibility (the Kafka_Sink EOS/flush
    contract, wf/kafka/kafka_sink.hpp:179-203, expressed as files).
    abort() deletes the orphaned temps so a failed job leaves no partial
    output visible."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _PartCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartCommit(path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        final, total = [], 0
        for i, m in enumerate(m for m in messages if m is not None):
            dst = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.path, dst)
            final.append(os.path.basename(dst))
            total += m.n_rows
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump({"files": final, "n_rows": total}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming form: one manifest per micro-batch (`_MANIFEST-<batch>`),
    written only in commit — a replayed batch after failure overwrites
    the same manifest name, keeping visibility idempotent per batch id."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _PartCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartCommit(path=tmp, n_rows=n)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        final, total = [], 0
        for i, m in enumerate(m for m in messages if m is not None):
            dst = os.path.join(self.path, f"batch-{batchId:05d}-part-{i:05d}.jsonl")
            os.replace(m.path, dst)
            final.append(os.path.basename(dst))
            total += m.n_rows
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId:05d}.json"), "w"
        ) as f:
            json.dump({"batch": batchId, "files": final, "n_rows": total}, f)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlManifestDataSource(DataSource):
    """`spark.dataSource.register(JsonlManifestDataSource)` then
    `df.write.format("jsonl_manifest").option("path", dir).save()` /
    `df.writeStream.format("jsonl_manifest")...`."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options, overwrite)

    def streamWriter(  # noqa: N802
        self, schema, overwrite: bool
    ) -> DataSourceStreamWriter:
        return _JsonlStreamWriter(self.options)
