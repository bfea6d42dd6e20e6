"""Interval (time-range) stream-stream join — the reference's only join
(Interval_Join, reference wf/interval_join.hpp:279-313, bounds
wf/builders.hpp:1480-1493).

Semantics: for a∈A, b∈B with equal keys, match when
``ts(b) ∈ [ts(a) + lower, ts(a) + upper]`` (bounds inclusive). Output
timestamp = max of the two sides (reference wf/interval_join.hpp:305-306).

Physical modes: the reference's KP (key-partitioned) maps to Spark's shuffle
hash/sort-merge join on the key; DP (data-partitioned broadcast,
wf/basic.hpp:87) maps to a broadcast join — pass ``broadcast_side`` when one
side is small. At 100 TB the equi-key condition keeps this a partitioned
equi-join with a residual range predicate (NOT a cross join); AQE handles
skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    a_ts: str,
    b_ts: str,
    lower_us: int,
    upper_us: int,
    broadcast_side: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a and b on equal keys and b.ts within [a.ts+lower, a.ts+upper].

    Columns from ``a`` keep their names; the caller should pre-alias/rename
    colliding columns. ``broadcast_side`` ∈ {None, 'a', 'b'} selects the
    reference's DP mode (broadcast) vs KP mode (shuffle).
    """
    aa = a.alias("a")
    bb = b.alias("b")
    if broadcast_side == "a":
        aa = F.broadcast(aa)
    elif broadcast_side == "b":
        bb = F.broadcast(bb)
    key_eq = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    from windflow_spark.operators.timeutil import event_micros

    a_us = event_micros(a, a_ts, qualifier="a")
    b_us = event_micros(b, b_ts, qualifier="b")
    cond = key_eq + [b_us >= a_us + F.lit(lower_us), b_us <= a_us + F.lit(upper_us)]
    joined = aa.join(bb, F.lit(True) if not cond else _and_all(cond), how=how)
    return joined


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def band_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    a_val: str,
    b_val: str,
    lower: float,
    upper: float,
    broadcast_side: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Numeric band (range) join: b.val within [a.val+lower, a.val+upper]
    per key — the interval join generalized from event-time to any ordered
    column (the reference's join is time-only, wf/interval_join.hpp:279-295).

    Same physical shape as interval_join: equi-join on keys with a residual
    band predicate, so Catalyst plans a hash join (shuffle or broadcast via
    ``broadcast_side``), never a cartesian product."""
    aa = a.alias("a")
    bb = b.alias("b")
    if broadcast_side == "a":
        aa = F.broadcast(aa)
    elif broadcast_side == "b":
        bb = F.broadcast(bb)
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    av, bv = F.col(f"a.{a_val}"), F.col(f"b.{b_val}")
    cond += [bv >= av + F.lit(lower), bv <= av + F.lit(upper)]
    return aa.join(bb, _and_all(cond), how=how)
