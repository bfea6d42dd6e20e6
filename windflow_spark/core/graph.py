"""PipeGraph / MultiPipe — the WindFlow composition surface, compiling to
DataFrame plans.

Reference: MultiPipe (wf/multipipe.hpp:90-126) is a pipeline of operators;
PipeGraph (wf/pipegraph.hpp:74) is a DAG of MultiPipes built with merge()
(fan-in union) and split() (content-based fan-out); run() executes
(wf/pipegraph.hpp:610).

Design stance (SURVEY.md §3): builder calls append LAZY DataFrame
transformations — Catalyst is the planner. WindFlow's physical knobs are
mapped, not emulated:

- ``with_parallelism(n)`` → advisory repartition hint (usually a no-op:
  Catalyst/AQE pick shuffle widths; forcing them is an anti-pattern at scale).
- ``chain()`` → identical to add(): whole-stage codegen fuses narrow ops.
- Execution modes (wf/basic.hpp:78): DEFAULT and DETERMINISTIC produce
  identical results for keyed computations in batch (results are
  deterministic by construction); PROBABILISTIC (K-slack reorder) is a
  lossy runtime discipline with no Spark analog — accepted and documented
  as equivalent-to-DEFAULT.
- Time policies (wf/basic.hpp:81): EVENT_TIME uses a data timestamp column;
  INGRESS_TIME stamps ``current_timestamp()`` at source.
"""

from __future__ import annotations

import enum
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ExecutionMode(enum.Enum):
    DEFAULT = "default"
    DETERMINISTIC = "deterministic"
    PROBABILISTIC = "probabilistic"


class TimePolicy(enum.Enum):
    INGRESS_TIME = "ingress_time"
    EVENT_TIME = "event_time"


class MultiPipe:
    """A linear pipeline of transformations over one DataFrame lineage.

    Mirrors wf/multipipe.hpp's fluent surface: map/filter/flatmap/reduce/
    window/sink appended with add()/chain(); merge/split at the graph level.
    """

    def __init__(self, graph: "PipeGraph", df: DataFrame):
        self.graph = graph
        self.df = df

    # -- per-row transforms (reference wf/map.hpp, wf/filter.hpp, wf/flatmap.hpp)

    def map(self, *cols: Column | str) -> "MultiPipe":
        """1→1 transform: projection/computed columns (Map operator)."""
        return MultiPipe(self.graph, self.df.select(*cols))

    def with_column(self, name: str, col: Column) -> "MultiPipe":
        return MultiPipe(self.graph, self.df.withColumn(name, col))

    def filter(self, predicate: Column) -> "MultiPipe":
        """Filter operator (reference wf/filter.hpp:245)."""
        return MultiPipe(self.graph, self.df.filter(predicate))

    def flat_map(self, explode_col: Column, alias: str, keep: Sequence[str] = ()) -> "MultiPipe":
        """1→N transform: explode an array-valued expression (FlatMap +
        Shipper, reference wf/flatmap.hpp:215)."""
        out = self.df.select(*keep, F.explode(explode_col).alias(alias))
        return MultiPipe(self.graph, out)

    def flat_map_py(
        self,
        fn,
        out_schema: str,
        in_cols: Sequence[str],
        keep: Sequence[str] = (),
    ) -> "MultiPipe":
        """1→N transform with IMPERATIVE per-row python logic — the escape
        hatch for FlatMap functors (reference wf/flatmap.hpp:215, the
        arbitrary-emit `Shipper` form) that no array expression can
        express. ``fn(*in_col_values)`` must be a generator yielding
        output tuples matching ``out_schema``. Compiled to a Spark Python
        UDTF in a LATERAL join; ``keep`` columns pass through alongside.

        This is the SLOW path — per-row Python, not Arrow-vectorized
        (enable spark.sql.execution.pythonUDTF.arrow.enabled to batch the
        transfer). Reach for `flat_map` (JVM explode) first, then
        mapInPandas for batchable logic; use this only when the emission
        logic is genuinely imperative per-row.
        """
        from pyspark.sql.functions import udtf

        class _FlatMap:
            def eval(self, *args):  # noqa: ANN001 - UDTF protocol
                yield from fn(*args)

        u = udtf(_FlatMap, returnType=out_schema)
        df = self.df
        # .outer() marks the args as correlated references into the left
        # side of the lateral join (PySpark 4 lateral-correlation API)
        joined = df.lateralJoin(u(*[F.col(c).outer() for c in in_cols]))
        return MultiPipe(
            self.graph,
            joined.select(
                *keep, *[f.split(":")[0].strip() for f in out_schema.split(",")]
            ),
        )

    # -- stateful ops

    def reduce(self, key_cols: Sequence[str], order_cols: Sequence[str],
               folds: dict[str, Column]) -> "MultiPipe":
        """Rolling keyed fold emitting per input (reference wf/reduce.hpp)."""
        from windflow_spark.operators.reduce import rolling_reduce

        return MultiPipe(self.graph, rolling_reduce(self.df, key_cols, order_cols, folds))

    def keyed_windows_tb(self, key_cols: Sequence[str], ts_col: str,
                         length_us: int, slide_us: int | None,
                         aggs: Sequence) -> "MultiPipe":
        """Keyed TB windows (reference wf/keyed_windows.hpp:65). ``aggs``
        may be Column expressions (direct form always) or a declarative
        [(op, col, alias), ...] spec — the spec form enables the pane
        auto-rewrite for dense sliding configs (len/slide >= 8 routes
        through paned_window_tb, reference wf/paned_windows.hpp:140-141)."""
        from windflow_spark.operators.windows import (
            sliding_window_tb,
            sliding_window_tb_auto,
            spec_aggs,
            tumbling_window_tb,
        )

        is_spec = bool(aggs) and isinstance(aggs[0], tuple)
        if slide_us is None or slide_us == length_us:
            cols = spec_aggs(aggs) if is_spec else aggs
            out = tumbling_window_tb(self.df, key_cols, ts_col, length_us, cols)
        elif is_spec:
            out = sliding_window_tb_auto(
                self.df, key_cols, ts_col, length_us, slide_us, aggs
            )
        else:
            out = sliding_window_tb(self.df, key_cols, ts_col, length_us, slide_us, aggs)
        return MultiPipe(self.graph, out)

    def keyed_windows_cb(self, key_cols: Sequence[str], order_cols: Sequence[str],
                         length: int, slide: int | None,
                         aggs: Sequence[Column]) -> "MultiPipe":
        from windflow_spark.operators.windows import sliding_window_cb, tumbling_window_cb

        if slide is None or slide == length:
            out = tumbling_window_cb(self.df, key_cols, order_cols, length, aggs)
        else:
            out = sliding_window_cb(self.df, key_cols, order_cols, length, slide, aggs)
        return MultiPipe(self.graph, out)

    def interval_join(self, other: "MultiPipe", key_cols: Sequence[str],
                      a_ts: str, b_ts: str, lower_us: int, upper_us: int,
                      broadcast_side: str | None = None) -> "MultiPipe":
        from windflow_spark.operators.interval_join import interval_join as ij

        return MultiPipe(
            self.graph,
            ij(self.df, other.df, key_cols, a_ts, b_ts, lower_us, upper_us,
               broadcast_side=broadcast_side),
        )

    def session_windows(self, key_cols: Sequence[str], ts_col: str,
                        order_cols: Sequence[str], gap_us: int,
                        aggs: Sequence[Column]) -> "MultiPipe":
        """Gap-merged session windows (driver-schema extension; streaming
        sibling streaming_session_window)."""
        from windflow_spark.operators.windows import session_window_agg

        return MultiPipe(
            self.graph,
            session_window_agg(self.df, key_cols=key_cols, ts_col=ts_col,
                               order_cols=order_cols, gap_us=gap_us, aggs=aggs),
        )

    def asof_join(self, other: "MultiPipe", key_cols: Sequence[str],
                  a_ts: str, b_ts: str, b_payload: Sequence[str],
                  how: str = "left", prefix: str = "b_") -> "MultiPipe":
        """Backward as-of join: latest ``other`` row at or before each left
        row's timestamp (operators/asof_join.py union+forward-fill — no
        per-row lookup join)."""
        from windflow_spark.operators.asof_join import asof_join_backward

        return MultiPipe(
            self.graph,
            asof_join_backward(self.df, other.df, key_cols, a_ts, b_ts,
                               b_payload, how=how, prefix=prefix),
        )

    def kslack(self, key_cols: Sequence[str], ts_col: str,
               arrival_col: str) -> "MultiPipe":
        """KSlack_Collector (PROBABILISTIC) analog: replay each key's
        arrival sequence through the K-slack reorder buffer
        (operators/kslack.py — reference-exact warm-up and horizon drops).
        The reorder core works on the reference's integer-µs time model; a
        timestamp-typed column is converted transparently."""
        from pyspark.sql.types import TimestampNTZType, TimestampType

        from windflow_spark.operators.kslack import kslack_reorder
        from windflow_spark.operators.timeutil import event_micros

        df = self.df
        if isinstance(df.schema[ts_col].dataType, (TimestampType, TimestampNTZType)):
            df = df.withColumn("_ks_us", event_micros(df, ts_col))
            out = kslack_reorder(df, key_cols, "_ks_us", arrival_col).drop("_ks_us")
        else:
            out = kslack_reorder(df, key_cols, ts_col, arrival_col)
        return MultiPipe(self.graph, out)

    # -- DAG combinators (reference wf/multipipe.hpp:1179-1260)

    def merge(self, *others: "MultiPipe") -> "MultiPipe":
        from windflow_spark.operators.routing import merge_pipes

        return MultiPipe(self.graph, merge_pipes(self.df, *[o.df for o in others]))

    def split(self, routes: Sequence[Column]) -> list["MultiPipe"]:
        from windflow_spark.operators.routing import split_pipe

        return [MultiPipe(self.graph, d) for d in split_pipe(self.df, routes)]

    # -- physical knobs (advisory; Catalyst decides)

    def with_parallelism(self, n: int, *cols: str) -> "MultiPipe":
        """KeyBy/Rebalancing emitter analog: repartition. Prefer leaving this
        to AQE; exposed for API parity (reference wf/keyby_emitter.hpp)."""
        if cols:
            return MultiPipe(self.graph, self.df.repartition(n, *cols))
        return MultiPipe(self.graph, self.df.repartition(n))

    def chain(self, fn: Callable[[DataFrame], DataFrame]) -> "MultiPipe":
        """Operator fusion is automatic (whole-stage codegen); chain == add."""
        return MultiPipe(self.graph, fn(self.df))

    def add(self, fn: Callable[[DataFrame], DataFrame]) -> "MultiPipe":
        return MultiPipe(self.graph, fn(self.df))

    # -- sinks (reference wf/sink.hpp:199)

    def add_sink(self) -> DataFrame:
        """Terminal: hand the lazy plan back; the caller (driver) collects or
        writes. No collect() here by design."""
        self.graph._sinks.append(self.df)
        return self.df


class PipeGraph:
    """DAG of MultiPipes (reference wf/pipegraph.hpp:74,545-547)."""

    def __init__(
        self,
        spark: SparkSession,
        name: str = "pipegraph",
        mode: ExecutionMode = ExecutionMode.DEFAULT,
        policy: TimePolicy = TimePolicy.EVENT_TIME,
    ):
        self.spark = spark
        self.name = name
        self.mode = mode
        self.policy = policy
        self._sinks: list[DataFrame] = []

    def add_source(self, df: DataFrame, ts_col: str | None = None) -> MultiPipe:
        """Attach a source DataFrame. INGRESS_TIME stamps wall-clock at the
        source (reference wf/source_shipper.hpp:171-188)."""
        if self.policy is TimePolicy.INGRESS_TIME and ts_col is not None:
            df = df.withColumn(ts_col, F.current_timestamp())
        return MultiPipe(self, df)

    def run(self) -> list[DataFrame]:
        """Return the sink plans (lazy). Streaming graphs start queries via
        windflow_spark.streaming instead."""
        return list(self._sinks)
