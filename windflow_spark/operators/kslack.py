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
    import bisect

    key_list = list(key_cols)
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join(out_fields) + f", {emit_col} long"
    field_names = [f.name for f in df.schema.fields]

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        """Exact replay of wf/kslack_collector.hpp:97-147 (insertInput /
        extractInput) + svc:183-207 drop check + eosnotify:210-230 flush.

        Per input: append ts to ts_vect and insert into the ts-sorted buffer.
        When ts > tcurr (advance), K grows to max(K, max(tcurr_new - ts_i))
        over ALL ts seen since the previous advance — delays are recomputed
        against the NEW tcurr, not each tuple's own arrival-time tcurr (a
        per-arrival K underestimates slack and over-drops; ADVICE r1). Then
        buffered tuples with ts <= tcurr - K are extracted in ts order; an
        extracted tuple behind the last emitted timestamp is dropped.
        Timestamps are µs-from-zero, non-negative (wf/basic.hpp:49-61) —
        tcurr/K/last init 0 like the reference's uint64 fields.
        """
        pdf = pdf.sort_values(arrival_col)
        tcurr = 0
        k = 0  # monotone slack
        last_ts = 0  # ts of the newest emitted tuple (reference last_timestamp)
        ts_vect: list[int] = []  # timestamps since the last tcurr advance
        buf: list[tuple[int, int, dict]] = []  # (ts, arrival-seq) sorted
        released: list[dict] = []

        def extract() -> None:
            nonlocal last_ts
            limit = tcurr - k
            i = 0
            while i < len(buf) and buf[i][0] <= limit:
                ts, _, row = buf[i]
                if ts < last_ts:
                    pass  # behind the emitted horizon — drop (svc:195-200)
                else:
                    released.append(row)
                    last_ts = ts
                i += 1
            del buf[:i]

        for seq, row in enumerate(pdf.to_dict("records")):
            ts = row[ts_col]
            ts_vect.append(ts)
            bisect.insort(buf, (ts, seq, row), key=lambda e: (e[0], e[1]))
            if ts > tcurr:
                tcurr = ts
                k = max(k, max(tcurr - t for t in ts_vect))
                ts_vect.clear()
                extract()
        # EOS flush (eosnotify): emit the remaining buffer in ts order,
        # dropping anything behind the emitted horizon
        for ts, _, row in buf:
            if ts < last_ts:
                continue
            released.append(row)
            last_ts = ts
        for i, row in enumerate(released):
            row[emit_col] = i
        return pd.DataFrame(released) if released else pd.DataFrame(
            {c: [] for c in field_names + [emit_col]}
        )

    return df.groupBy(*key_list).applyInPandas(replay, out_schema)
