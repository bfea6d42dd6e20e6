"""The driver-gate slice is a non-curated scheduler (r7 VERDICT #1):
computed from committed CORRECTNESS_r*.json artifacts by a fixed rule
(canaries + never-driver-checked in registry order + least-recently-
checked), so every registry entry earns a driver row within ~6 rounds
and no hand-picked list decides what the external gate sees."""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked() -> dict[str, int]:
    seen: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        rnd = int(p.rsplit("_r", 1)[-1].split(".")[0])
        for k in json.load(open(p)):
            seen[k] = max(seen.get(k, 0), rnd)
    return seen


def test_slice_width_and_canaries():
    names = list(entry_mod.queries())
    head = names[: entry_mod.GATE_WIDTH]
    assert len(head) == entry_mod.GATE_WIDTH
    for canary in entry_mod.GATE_CANARIES:
        assert canary in head


def test_slice_prefers_never_checked_in_registry_order():
    seen = _driver_checked()
    if not seen:  # fresh clone: static fallback applies, nothing to check
        return
    names = list(entry_mod.queries())
    head = names[: entry_mod.GATE_WIDTH]
    non_canary = [n for n in head if n not in entry_mod.GATE_CANARIES]
    never = [n for n in non_canary if n not in seen]
    # while >48 never-checked names exist, the slice must be all of them
    from windflow_spark import queries as q

    registry = list(q.QUERIES)
    all_never = [
        n
        for n in registry
        if n not in seen and n not in entry_mod.GATE_CANARIES
    ]
    expected = all_never[: len(non_canary)]
    assert never == expected, "slice must take never-checked names in strict registry order"


def test_slice_disjoint_from_previous_round():
    seen = _driver_checked()
    if not seen:
        return
    latest = max(seen.values())
    prev = {
        k
        for p in glob.glob(os.path.join(HERE, f"CORRECTNESS_r{latest:02d}.json"))
        for k in json.load(open(p))
    }
    # only meaningful while never-checked names outnumber the slice
    from windflow_spark import queries as q

    n_never = sum(
        1
        for n in q.QUERIES
        if n not in _driver_checked() and n not in entry_mod.GATE_CANARIES
    )
    if n_never < entry_mod.GATE_WIDTH - len(entry_mod.GATE_CANARIES):
        return
    head = list(entry_mod.queries())[: entry_mod.GATE_WIDTH]
    overlap = [
        n for n in head if n in prev and n not in entry_mod.GATE_CANARIES
    ]
    assert overlap == []


def test_oracle_order_matches_queries_order():
    assert list(entry_mod.queries()) == list(entry_mod.oracle_sql())
