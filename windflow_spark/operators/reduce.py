"""Rolling keyed reduce — WindFlow's Reduce operator (reference
wf/reduce.hpp:176, emit-per-input wf/reduce.hpp:~135-142).

Semantics: per-key mutable state folded over the stream, with the state
emitted after EVERY input (update-mode running aggregate). Batch equivalent:
an analytic window frame ``rowsBetween(unboundedPreceding, currentRow)`` over
a deterministic per-key order. WindFlow only defines order per key (arrival
order after keyby routing); we pin it to explicit order columns.

Scale: one shuffle by key; the running frame is computed per partition with
no row replication. Skewed keys hit the same replica in WindFlow too — for
heavy keys, pre-aggregate or salt upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def rolling_reduce(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    folds: dict[str, Column],
) -> DataFrame:
    """Append running-aggregate columns per key.

    ``folds`` maps output column name → aggregate Column (e.g.
    ``{"running_sum": F.sum("value")}``); each is evaluated over the frame
    (unboundedPreceding, currentRow) ordered by ``order_cols`` within the key.
    The input row is preserved — output has one row per input, like the
    reference's per-input state emission.
    """
    frame = (
        W.partitionBy(*key_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = df
    for name, agg in folds.items():
        out = out.withColumn(name, agg.over(frame))
    return out
