"""User-defined aggregation surfaces — the reference's UDF grammar
(SURVEY.md §2.11) mapped to Spark.

WindFlow's Ffat lift+combine pair (reference wf/builders.hpp:1288-1298:
``lift: void(const tuple_t&, result_t&)``, associative
``combine: void(const result_t&, const result_t&, result_t&)``) is exactly
Spark's partial-aggregation contract. Two implementations:

1. ``lift_combine_agg`` — COLUMN-EXPRESSION form: lift is a Column expr,
   combine is one of the built-in associative aggregates. JVM-side, full
   codegen; the right choice whenever the lift/combine pair is expressible.
2. ``pandas_udaf`` — ARBITRARY-PYTHON form via a grouped-agg pandas UDF
   (Arrow-batched series → scalar). For logic Spark exprs can't express.
   Spark applies it per-group WITHOUT partial aggregation (whole group
   shuffles) — use 1 whenever possible.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lift_combine_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    lift: Column,
    combine: Callable[[Column], Column],
    out_name: str,
) -> DataFrame:
    """Ffat-style aggregation: ``lift`` maps each row to a partial value,
    ``combine`` is an associative built-in (F.sum/F.min/F.max/...). Spark
    splits it into partial+final automatically — the FlatFAT tree's work
    sharing without the tree."""
    return df.groupBy(*key_cols).agg(combine(lift).alias(out_name))


def pandas_udaf(fn: Callable, return_type: str):
    """Wrap an arbitrary python reduction (pandas Series -> scalar) as a
    grouped-agg UDF. Example::

        gmean = pandas_udaf(lambda s: float(np.exp(np.log(s).mean())), "double")
        df.groupBy("k").agg(gmean("value"))
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: a plain callable without type hints would be
    # inferred as a scalar UDF and rejected inside agg()
    return pandas_udf(fn, return_type, PandasUDFType.GROUPED_AGG)
