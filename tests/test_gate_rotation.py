"""The driver-gate slice is a non-curated scheduler (r7 VERDICT #1):
computed from committed CORRECTNESS_r*.json artifacts by a fixed rule
(canaries + last-round FAILED + never-driver-checked in registry order +
least-recently-checked), so a driver-red row earns its re-check the very
next round (r8 VERDICT #2), every registry entry earns a driver row
within ~6 rounds, and no hand-picked list decides what the external gate
sees."""

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


def _last_round_failed() -> set[str]:
    seen = _driver_checked()
    if not seen:
        return set()
    latest = max(seen.values())
    failed: set[str] = set()
    for p in glob.glob(os.path.join(HERE, f"CORRECTNESS_r{latest:02d}.json")):
        for k, v in json.load(open(p)).items():
            if isinstance(v, dict) and (
                v.get("err") is not None
                or not all(
                    v.get(f, True)
                    for f in ("rows_match", "schema_match", "hash_match")
                )
            ):
                failed.add(k)
    return failed


def test_slice_width_and_canaries():
    names = list(entry_mod.queries())
    head = names[: entry_mod.GATE_WIDTH]
    assert len(head) == entry_mod.GATE_WIDTH
    for canary in entry_mod.GATE_CANARIES:
        assert canary in head


def test_slice_regates_last_round_failures_first():
    """A driver-red name must appear in the head immediately after the
    canaries — before any never-checked name (r8 VERDICT #2)."""
    failed = _last_round_failed()
    names = list(entry_mod.queries())
    head = names[: entry_mod.GATE_WIDTH]
    n_canaries = len(entry_mod.GATE_CANARIES)
    expected_failed = [
        n for n in failed if n not in entry_mod.GATE_CANARIES and n in names
    ]
    got = head[n_canaries : n_canaries + len(expected_failed)]
    assert sorted(got) == sorted(expected_failed)


def test_slice_prefers_never_checked_in_registry_order():
    seen = _driver_checked()
    if not seen:  # fresh clone: static fallback applies, nothing to check
        return
    failed = _last_round_failed()
    names = list(entry_mod.queries())
    head = names[: entry_mod.GATE_WIDTH]
    non_canary = [
        n
        for n in head
        if n not in entry_mod.GATE_CANARIES and n not in failed
    ]
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


def test_gate_slice_priority_order_synthetic(tmp_path):
    """Pin the full tier order on synthetic artifacts: canaries, then
    last-round failures (rows/schema/hash red or err), then never-checked
    in input order, then least-recently-checked."""
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    bad_hash = dict(ok, hash_match=False)
    bad_err = dict(ok, err="boom")
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q1_pricing_summary": ok, "old_a": ok, "old_b": ok})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "q1_pricing_summary": ok,
                "old_b": ok,
                "red_hash": bad_hash,
                "red_err": bad_err,
            }
        )
    )
    names = [
        "q1_pricing_summary",
        "q6_revenue_filter",
        "new_1",
        "red_err",
        "old_a",
        "new_2",
        "old_b",
        "red_hash",
    ]
    got = entry_mod._gate_slice(names, artifacts_dir=str(tmp_path))
    assert got == [
        # canaries (registry presence order of GATE_CANARIES)
        "q1_pricing_summary",
        "q6_revenue_filter",
        # last-round failures, input order
        "red_err",
        "red_hash",
        # never checked, input order
        "new_1",
        "new_2",
        # least-recently-checked: old_a last seen r1, old_b r2
        "old_a",
        "old_b",
    ]


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
    # last-round failures are the one sanctioned re-check (r8 VERDICT #2)
    failed = _last_round_failed()
    overlap = [
        n
        for n in head
        if n in prev and n not in entry_mod.GATE_CANARIES and n not in failed
    ]
    assert overlap == []


def test_oracle_order_matches_queries_order():
    assert list(entry_mod.queries()) == list(entry_mod.oracle_sql())
