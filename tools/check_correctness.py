"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs the
matching oracle_sql() in DuckDB over the same parquet files, and compares:
row count, column names, and order-insensitive values (sorted by all
columns). Exact comparison — if this passes, the driver's value-hash should
too (both engines emit identical bits for the conventions in
windflow_spark/queries.py).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _is_date_object(s: pd.Series) -> bool:
    """True for an object column whose non-null values are datetime.date
    (Spark DateType arrives via toPandas as object-of-date; DuckDB DATE
    arrives as datetime64 — normalize both to datetime64[us])."""
    import datetime as _dt

    if s.dtype != object:
        return False
    nn = s.dropna()
    if nn.empty:
        return False
    # check ALL values, not a head-sample: a mixed column (dates then
    # strings) must fail the sniff and fall through to the object path,
    # not crash pd.to_datetime inside normalize()
    return all(type(v) is _dt.date for v in nn)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if _is_date_object(s):
            s = pd.to_datetime(s)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def dtype_kind(s: pd.Series) -> str:
    """Coarse dtype KIND for driver-hash-faithfulness: the driver's
    order-insensitive value-hash stringifies values, so int64 8 vs float64
    8.0 hash differently even when elementwise == says True. r8+r9's one
    red row was exactly this class, invisible to the old elementwise-only
    compare."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        ka, kb = dtype_kind(a[c]), dtype_kind(b[c])
        if ka != kb:
            # an ALL-NULL column carries no representable values — pandas
            # types it object on one engine and NaT/NaN on the other, but
            # every hashed value is a null either way (alert_hysteresis at
            # sf0.1: zero alerts fire → first_alert_day all null)
            if a[c].isna().all() and b[c].isna().all():
                continue
            problems.append(
                f"col {c}: dtype KIND mismatch spark={ka}({a[c].dtype}) duck={kb}({b[c].dtype})"
                " — the driver's value-hash stringifies these differently"
            )
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:3]
                diffs = [(float(av.iloc[i]), float(bv.iloc[i])) for i in bad]
                maxd = np.nanmax(np.abs(av.to_numpy(float) - bv.to_numpy(float)))
                problems.append(f"col {c}: {int((~eq).sum())} mismatches, e.g. {diffs}, maxdiff={maxd}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:3]
                diffs = [(av.iloc[i], bv.iloc[i]) for i in bad]
                problems.append(f"col {c}: {int((~eq).sum())} mismatches, e.g. {diffs}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    # DRIVER-FAITHFUL session: the driver's gate runs a BARE SparkSession —
    # none of get_spark()'s tuned configs (UTC timezone, AQE knobs, shuffle
    # width, arrow settings). Queries must be correct without them, so the
    # local gate uses the same bare session (round 3's regression was
    # exactly a session-environment drift the tuned session could mask).
    # Set SPARK_GRAFT_CHECK_TUNED=1 to use the library session instead.
    if os.environ.get("SPARK_GRAFT_CHECK_TUNED"):
        from windflow_spark import get_spark

        spark = get_spark("check_correctness")
    else:
        from pyspark.sql import SparkSession

        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
        spark = (
            SparkSession.builder.appName("check_correctness")
            .master(f"local[{cpus}]")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(sdf)} spark rows, {len(ddf)} duck rows):")
            for p in problems:
                print(f"   {p}")
        else:
            passed.append(name)
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
