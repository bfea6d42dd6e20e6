"""K-slack approximate reordering — the PROBABILISTIC execution mode
(reference Execution_Mode_t wf/basic.hpp:78, KSlack_Collector
wf/kslack_collector.hpp:52,97-147).

The reference's collector buffers out-of-order tuples and releases those
with ts ≤ t_curr − K, where K is the maximum arrival delay observed so far
(it only grows); tuples arriving behind an already-emitted horizon are
dropped. It is a runtime discipline on an arrival ORDER, so the batch
analog needs the arrival order to be explicit: an ``arrival_col`` gives
the sequence in which tuples reached the collector.

Spark-first shape: per-key applyInPandas — each key's sequence is an
independent task (the reference runs one collector per replica, fed by
KEYBY routing), nothing touches the driver, and state is one buffer per
key bounded by K's span. For global (unkeyed) reordering pass a constant
key column, accepting single-task sequencing exactly as a single-replica
collector would.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def kslack_reorder(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    arrival_col: str,
    emit_col: str = "emit_seq",
) -> DataFrame:
    """Replay each key's arrival sequence through a K-slack buffer.

    Output = the tuples the collector would RELEASE, with ``emit_col``
    numbering the emission order per key (released tuples are in
    non-decreasing ts order within a key; late tuples — ts at or behind an
    already-released horizon when K has stabilized — are dropped, matching
    wf/kslack_collector.hpp:97-147's insertion check + purge loop).
    """
    key_list = list(key_cols)
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join(out_fields) + f", {emit_col} long"
    field_names = [f.name for f in df.schema.fields]

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(arrival_col)
        k = None  # max observed delay, monotone (kslack_collector.hpp:118-124)
        t_curr = None  # max ts seen
        horizon = None  # ts of the newest released tuple
        buf: list[tuple[int, dict]] = []
        released: list[dict] = []

        def release(limit_ts: int) -> None:
            nonlocal horizon
            buf.sort(key=lambda e: e[0])
            keep = []
            for ts, row in buf:
                if ts <= limit_ts:
                    released.append(row)
                    horizon = ts if horizon is None else max(horizon, ts)
                else:
                    keep.append((ts, row))
            buf[:] = keep

        for row in pdf.to_dict("records"):
            ts = row[ts_col]
            if t_curr is None or ts > t_curr:
                t_curr = ts
            # K learns from EVERY arrival's delay — including tuples about
            # to be dropped — else disorder behind the horizon never grows K
            # (kslack_collector.hpp updates the slack before the insert check)
            d = t_curr - ts
            k = d if k is None else max(k, d)
            if horizon is not None and ts < horizon:
                continue  # late: behind the emitted horizon — drop
            buf.append((ts, row))
            release(t_curr - k)
        # EOS flush: the reference emits the remaining buffer in order
        release(float("inf"))
        for i, row in enumerate(released):
            row[emit_col] = i
        return pd.DataFrame(released) if released else pd.DataFrame(
            {c: [] for c in field_names + [emit_col]}
        )

    return df.groupBy(*key_list).applyInPandas(replay, out_schema)
