"""Join-strategy invariants: salting must not change results, bucketing must
eliminate the join exchange, sketch quantiles must be within their bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql4pandas_spark.operators import joins
from sql4pandas_spark.plans import formatted_plan
from sql4pandas_spark.sources.parquet import register_tables
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def tables(spark):
    return register_tables(spark, SF_SMALL, ("orders", "customer"))


def test_salted_join_equals_plain_join(spark, tables):
    plain = (
        tables["orders"]
        .join(tables["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_custkey")
    )
    salted = joins.salted_join(
        tables["orders"], tables["customer"], "o_custkey", "c_custkey"
    ).select("o_orderkey", "c_custkey")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer_preserves_unmatched(spark, tables):
    # restrict the small side so some big rows have no match
    small = tables["customer"].filter(F.col("c_custkey") <= 50)
    plain = tables["orders"].join(
        small, F.col("o_custkey") == F.col("c_custkey"), "left"
    )
    salted = joins.salted_join(
        tables["orders"], small, "o_custkey", "c_custkey", how="left"
    )
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("c_custkey").isNull()).count()
        == plain.filter(F.col("c_custkey").isNull()).count()
    )


def test_bucketed_join_has_no_join_exchange(spark, tables):
    """Both sides bucketed on the join key with equal bucket counts → the
    sort-merge join reads bucket files directly; the only exchanges left in
    the plan belong to the downstream aggregation, not the join."""
    joins.write_bucketed(
        tables["orders"].select("o_custkey", "o_totalprice"), "t_b_orders", "o_custkey"
    )
    joins.write_bucketed(
        tables["customer"].select("c_custkey", "c_mktsegment"), "t_b_customer", "c_custkey"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_b_orders").join(
            spark.table("t_b_customer"), F.col("o_custkey") == F.col("c_custkey")
        )
        plan = formatted_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_percentile_approx_within_bound(spark, tables):
    row = tables["orders"].agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10_000).alias("a"),
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("e"),
    ).collect()[0]
    for approx, exact in zip(row.a, row.e):
        assert abs(approx - exact) / exact < 0.02, (approx, exact)
