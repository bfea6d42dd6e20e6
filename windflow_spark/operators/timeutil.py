"""Event-time extraction tolerant of both Spark timestamp flavors.

WindFlow's time model is integer microseconds (reference wf/basic.hpp:49-61);
every window/join operator here derives epoch-µs from the event-time column.
`unix_micros` only accepts TIMESTAMP (LTZ) — handing it a TIMESTAMP_NTZ
column fails at analysis time (how round 3's driver regressed when the
testdata started inferring NTZ). The loader normalizes its own tables
(tables._normalize_timestamps), but operators are a public API over
arbitrary frames, so they dispatch on the column's actual type:

- TIMESTAMP: `unix_micros` — exact epoch µs.
- TIMESTAMP_NTZ: `timestampdiff(MICROSECOND, NTZ epoch, col)` — pure
  wall-clock arithmetic between two NTZ values, i.e. the naive time is read
  as UTC. Session-timezone-INDEPENDENT (a cast would shift values through
  the session zone), and consistent with how DuckDB and the loader treat
  naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def event_micros(df: DataFrame, ts_col: str, qualifier: str | None = None) -> Column:
    """Epoch-µs column for ``df[ts_col]`` of either timestamp flavor.

    ``qualifier``: alias prefix for join conditions (``a``/``b`` sides),
    where the column must be referenced through the alias but the TYPE is
    read from the un-aliased frame's schema.
    """
    ref = f"{qualifier}.{ts_col}" if qualifier else ts_col
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        quoted = ".".join(f"`{p}`" for p in ref.split("."))
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {quoted})"
        )
    return F.unix_micros(F.col(ref))
