"""Registry-wide lint for oracle output dtype KINDS.

DuckDB types `sum(BIGINT)` as HUGEINT, and `con.execute(...).df()` renders
HUGEINT as pandas float64 — so an oracle ending in a bare `sum(cnt)` emits
`8.0` where the Spark side emits int64 `8`. The driver's order-insensitive
value-hash stringifies the two differently: rows ✓ schema ✓ hash ✗, on any
machine, every round. That single defect kept `rollup_hierarchy_hourly_daily`
red through r8 AND r9 while the elementwise local gate (8 == 8.0 → True)
stayed green.

This lint keeps the class dead without running a single query: DuckDB
`DESCRIBE <oracle sql>` does planning only and reports the output column
types. Any HUGEINT/UHUGEINT output column means an integer sum escaped
without `CAST(... AS BIGINT)` and WILL hash-mismatch on the driver.

Paired with this, tools/check_correctness.py::compare now also fails on
per-column dtype-KIND mismatches (int/float/bool/datetime/object), so the
full local gate is hash-faithful, not merely value-faithful.
"""

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BANNED_TYPES = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _oracles():
    import __spark_entry__ as entry_mod

    return entry_mod.oracle_sql()


def test_lint_catches_the_class(con):
    """Prove the lint red-flags the exact r8/r9 defect: a bare sum(BIGINT)
    in the final SELECT must DESCRIBE as HUGEINT."""
    desc = con.execute(
        "DESCRIBE SELECT sum(o_custkey) AS s FROM orders"
    ).fetchall()
    assert desc[0][1] == "HUGEINT"


def test_comparator_fails_int_vs_float():
    """The local gate's compare() must red-flag int64 vs float64 even when
    elementwise == would say equal (8 == 8.0) — the r8/r9 blind spot."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pandas as pd

    from tools.check_correctness import compare

    a = pd.DataFrame({"k": [1, 2], "cnt": pd.array([8, 9], dtype="int64")})
    b = pd.DataFrame({"k": [1, 2], "cnt": pd.array([8.0, 9.0], dtype="float64")})
    problems = compare("t", a, b)
    assert problems and "KIND mismatch" in problems[0]
    assert not compare("t", a, a.copy())


def test_comparator_normalizes_date_objects():
    """Spark DateType → object-of-date vs DuckDB DATE → datetime64 is
    driver-tolerated; the gate normalizes both sides to datetime64[us] so
    the kind check reports zero unexplained mismatches."""
    import datetime
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pandas as pd

    from tools.check_correctness import compare

    a = pd.DataFrame({"d": [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]})
    b = pd.DataFrame({"d": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    assert not compare("t", a, b)


def test_no_hugeint_output_columns_in_any_oracle(con):
    offenders = []
    for name, sql in _oracles().items():
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:  # non-describable (e.g. PRAGMA-ish) — none today
            offenders.append(f"{name}: DESCRIBE failed: {e}")
            continue
        for col, typ, *_ in desc:
            base = typ.split("(")[0].upper()
            if base in BANNED_TYPES:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle output columns typed HUGEINT render as pandas float64 and "
        "hash-mismatch Spark's int64 on the driver — wrap the integer sum "
        "in CAST(... AS BIGINT): " + "; ".join(offenders)
    )
