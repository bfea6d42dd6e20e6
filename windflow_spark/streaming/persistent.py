"""Persistent stateful per-row operators — the P_* family (SURVEY.md §2.9).

WindFlow's P_Filter / P_Map / P_FlatMap / P_Reduce / P_Sink run the same
user logic as their stateless siblings but hand it a per-key mutable
``state_t`` kept in RocksDB (reference wf/persistent/p_filter.hpp:292,
p_map.hpp:272, p_flatmap.hpp:256, p_reduce.hpp:197, p_sink.hpp:244; user
serialize/deserialize wf/persistent/builders_rocksdb.hpp:346-363).

Spark-first mapping: keyed state lives in the streaming STATE STORE, and
durability is a provider config (rocksdb_state_conf()), not per-operator
plumbing — `applyInPandasWithState` gives the user callable the same
(tuple, state) contract, serialized by Arrow instead of user functions.
The per-key LRU/LFU caches of the reference (wf/persistent/cache/*) are
subsumed by the state store's block cache.

Scale note: state is hash-partitioned by key across executors exactly like
the reference's KEYBY routing; nothing here touches the driver. Per-row
Python is inherent to the P_* contract (arbitrary user logic per tuple) —
Arrow batches amortize the crossing; for analytics-style state prefer the
declarative forms in streaming/ops.py.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["p_map", "p_filter", "p_flatmap", "p_reduce", "p_reduce_tws"]


def _stateful(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    output_schema: str,
    state_schema: str,
    init_state: tuple,
    per_row: Callable[[dict, list], Any],
    collect: Callable[[dict, Any, list[dict]], None],
) -> DataFrame:
    """Shared driver: per key, rows are folded through ``per_row(row,
    state)`` in ``order_col`` order (the reference's per-key arrival order);
    ``collect`` decides what each call appends to the output."""
    key_list = list(key_cols)

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        st = list(state.get) if state.exists else list(init_state)
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            for row in pdf.to_dict("records"):
                collect(row, per_row(row, st), out)
        state.update(tuple(st))
        yield pd.DataFrame(out) if out else pd.DataFrame()

    return df.groupBy(*key_list).applyInPandasWithState(
        fold, output_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def p_map(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    func: Callable[[dict, list], dict],
    output_schema: str,
    state_schema: str,
    init_state: tuple,
) -> DataFrame:
    """P_Map: 1→1 transform with per-key persistent state. ``func(row,
    state) -> out_row`` mutates ``state`` in place (the reference's
    ``result_t(tuple&, state_t&)``, wf/persistent/p_map.hpp:272)."""
    return _stateful(
        df, key_cols, order_col, output_schema, state_schema, init_state,
        func, lambda row, res, out: out.append(res),
    )


def p_filter(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    predicate: Callable[[dict, list], bool],
    output_schema: str,
    state_schema: str,
    init_state: tuple,
) -> DataFrame:
    """P_Filter: keep the row iff ``predicate(row, state)`` — e.g. stateful
    dedup or rate limiting per key (wf/persistent/p_filter.hpp:292)."""
    return _stateful(
        df, key_cols, order_col, output_schema, state_schema, init_state,
        predicate, lambda row, res, out: out.append(row) if res else None,
    )


def p_flatmap(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    func: Callable[[dict, list], list],
    output_schema: str,
    state_schema: str,
    init_state: tuple,
) -> DataFrame:
    """P_FlatMap: 1→N with per-key persistent state; ``func`` returns a list
    of output rows (the reference ships via Shipper,
    wf/persistent/p_flatmap.hpp:256)."""
    return _stateful(
        df, key_cols, order_col, output_schema, state_schema, init_state,
        func, lambda row, res, out: out.extend(res),
    )


def p_reduce(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    func: Callable[[dict, list], None],
    output_schema: str,
    state_schema: str,
    init_state: tuple,
    vector_fold: Callable[[tuple, pd.DataFrame], tuple[pd.DataFrame, tuple]] | None = None,
) -> DataFrame:
    """P_Reduce: rolling fold emitting a copy of the state after EVERY
    input (update-mode running aggregate, wf/persistent/p_reduce.hpp:197 +
    the per-input emission of wf/reduce.hpp). Output row = key cols +
    order col + state tuple fields (in state_schema order).

    ``func`` is the reference contract — arbitrary per-row Python over
    (row, state). When the fold is expressible over a whole sorted batch at
    once (cumsum/cummax/cumulative anything — most running aggregates),
    pass ``vector_fold(state, sorted_pdf) -> (state_values_pdf, new_state)``
    instead: it receives the carry-in state tuple and the batch sorted by
    ``order_col``, and returns one row of state values PER INPUT ROW (a
    DataFrame with the state_schema columns) plus the carry-out tuple.
    Per-row Python disappears from the hot path — the numpy fast path of
    streaming_rolling_reduce, generalized (VERDICT r2 'wrong' #4).
    ``func`` may be None when ``vector_fold`` is given.
    """
    key_list = list(key_cols)
    state_names = [f.split()[0] for f in state_schema.split(",")]

    if vector_fold is not None:

        def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
            st = tuple(state.get) if state.exists else tuple(init_state)
            for pdf in pdfs:
                pdf = pdf.sort_values(order_col)
                state_vals, st = vector_fold(st, pdf)
                res = pdf[key_list + [order_col]].reset_index(drop=True)
                for name in state_names:
                    res[name] = state_vals[name].reset_index(drop=True)
                yield res
            state.update(tuple(st))

        return df.groupBy(*key_list).applyInPandasWithState(
            fold, output_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )

    def per_row_and_emit(row: dict, st: list) -> dict:
        func(row, st)
        rec = {k: row[k] for k in key_list}
        rec[order_col] = row[order_col]
        rec.update(zip(state_names, st))
        return rec

    return _stateful(
        df, key_cols, order_col, output_schema, state_schema, init_state,
        per_row_and_emit, lambda row, res, out: out.append(res),
    )


def p_reduce_tws(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    func,
    output_schema: str,
    state_schema: str,
    init_state: tuple,
) -> DataFrame:
    """P_Reduce on the MODERN state API (transformWithStateInPandas,
    Spark ≥4.0): same contract as p_reduce — fold ``func(row, state)`` per
    key in ``order_col`` order, emit the state after every input — but the
    per-key state is a typed ValueState in the RocksDB state store (this
    API REQUIRES the RocksDB provider; apply rocksdb_state_conf()).
    Runtime dependency: the transformWithState driver worker speaks
    protobuf — environments without ``google.protobuf`` must use the
    applyInPandasWithState form (p_reduce), which is dependency-free.

    Prefer this form for new code: ValueState/ListState/MapState compose,
    state has TTL support, and schema evolution is handled by the store —
    the closest Spark gets to the reference's typed per-key RocksDB state
    (wf/persistent/p_reduce.hpp:197 + builders_rocksdb.hpp serializers).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_list = list(key_cols)
    state_names = [f.split()[0] for f in state_schema.split(",")]

    class _Fold(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("fold_state", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            st = list(self._st.get()) if self._st.exists() else list(init_state)
            out: list[dict] = []
            for pdf in rows:
                pdf = pdf.sort_values(order_col)
                for row in pdf.to_dict("records"):
                    func(row, st)
                    rec = {k: row[k] for k in key_list}
                    rec[order_col] = row[order_col]
                    rec.update(zip(state_names, st))
                    out.append(rec)
            self._st.update(tuple(st))
            yield pd.DataFrame(out) if out else pd.DataFrame()

        def close(self) -> None:
            pass

    return df.groupBy(*key_list).transformWithStateInPandas(
        statefulProcessor=_Fold(),
        outputStructType=output_schema,
        outputMode="Append",
        timeMode="None",
    )
