"""DAG combinators: merge (fan-in union) and split (content-based fan-out) —
reference wf/multipipe.hpp:1179-1260, wf/splitting_emitter.hpp:49-62.

merge() unions N pipes of identical schema (WindFlow checks typeid equality,
wf/multipipe.hpp:1196-1201 — we use unionByName which checks by column name).
split() routes each row to one or several branches by a routing expression
(the reference's splitting function returns int or vector<int>); branches are
sibling filtered DataFrames over one parent — Catalyst reuses the scan, and a
multicast row simply passes several branch predicates.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame


def merge_pipes(*pipes: DataFrame) -> DataFrame:
    """Union N same-schema DataFrames (WindFlow merge(), union semantics —
    no dedup, no ordering guarantee)."""
    if not pipes:
        raise ValueError("merge_pipes needs at least one DataFrame")
    out = pipes[0]
    for p in pipes[1:]:
        out = out.unionByName(p)
    return out


def split_pipe(
    df: DataFrame,
    routes: Sequence[Column],
) -> list[DataFrame]:
    """Split a pipe into len(routes) branches; branch i receives rows where
    ``routes[i]`` holds. Overlapping predicates give multicast (a row may go
    to several branches), matching the vector<int> splitting form."""
    return [df.filter(r) for r in routes]


def split_by(
    df: DataFrame,
    routing_expr: Column,
    n: int,
) -> list[DataFrame]:
    """WindFlow's int-returning splitting function: branch i gets rows where
    routing_expr == i (reference wf/multipipe.hpp:1220-1260)."""
    return [df.filter(routing_expr == i) for i in range(n)]
