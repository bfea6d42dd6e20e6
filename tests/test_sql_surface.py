"""spark.sql surface: the registry's ANSI oracle strings must run on Spark
itself (not just DuckDB) against register_views and agree with the
DataFrame-API results — SQL-vs-DataFrame parity inside one engine."""

from __future__ import annotations

import pytest

from windflow_spark.queries import ORACLE, QUERIES
from windflow_spark.tables import register_views

# Oracles written in plain ANSI (no DuckDB list/lambda/:: extensions).
ANSI_QUERIES = [
    "q1_pricing_summary",
    "q6_revenue_filter",
    "q12_priority_class",
    "q21_sole_returned_supplier",
    "semi_join_customers",
    "anti_join_customers",
    "setop_union_distinct",
    "groupwise_max_order",
]


@pytest.mark.parametrize("name", ANSI_QUERIES)
def test_oracle_sql_runs_on_spark_and_matches_dataframe(spark, sf_dir, name):
    register_views(spark, sf_dir)
    via_sql = sorted(map(tuple, spark.sql(ORACLE[name]).collect()))
    via_df = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    assert via_sql == via_df
    if name != "anti_join_customers":  # legitimately empty at small SF
        assert len(via_df) > 0
