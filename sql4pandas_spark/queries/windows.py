"""Window functions (SURVEY.md §2.5 — Tier B; absent from the reference).

Scale notes: every window below partitions on a real key (custkey / global
windows are demo-only and flagged). A window with PARTITION BY shuffles once
on the partition key and sorts within partitions — the same shape at any
scale. A window WITHOUT partitioning collapses to a single task; the two
global-ordering demos here cap their input first (LIMIT pushdown) so the
single-task sort is bounded — at 100 TB you'd only ever run such a window
after an aggregation or with a partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql4pandas_spark.queries.catalog import query
from sql4pandas_spark.sources.parquet import register_tables


@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
    tags=("tier-b", "win_rank", "topk_per_group", "bench"),
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group = row_number + filter. Catalyst inserts a per-partition
    rank limit (WindowGroupLimit) before the shuffle, so only k rows per key
    survive the map side — the scalable form of "grab each group's top 3"."""
    t = register_tables(spark, sf_dir, ("orders",))
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(datediff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS INTEGER) AS gap_days
    FROM orders ORDER BY o_custkey, o_orderkey LIMIT 100
    """,
    tags=("tier-b", "win_lag"),
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic. Spark datediff(end, start) vs DuckDB datediff('day', start,
    end) — arg order flips, both cast to int32 (§2.12 #5)."""
    t = register_tables(spark, sf_dir, ("orders",))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
    )


@query(
    "window_running_revenue",
    oracle="""
    SELECT o_orderdate, o_orderkey,
           round(sum(o_totalprice) OVER (ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS run7
    FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 100
    """,
    tags=("tier-b", "win_frame"),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frame running sum. Globally-ordered window (single task) — kept as
    the canonical frame demo; partition on a key for production use."""
    t = register_tables(spark, sf_dir, ("orders",))
    w = Window.orderBy("o_orderdate", "o_orderkey").rowsBetween(-6, 0)
    return (
        t["orders"]
        .select(
            "o_orderdate",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("run7"),
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "window_range_price_band",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS band_sum
    FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    tags=("tier-b", "win_rangeframe"),
)
def window_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame: sum of all orders within $1000 below each
    order's price. Peers with equal o_totalprice are included on both engines."""
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               round(sum(o_totalprice) OVER (ORDER BY o_totalprice
                     RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS band_sum
        FROM orders ORDER BY o_orderkey LIMIT 100
        """
    )


@query(
    "window_ntile_rank_kinds",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4)    OVER w AS INTEGER) AS quartile,
           CAST(rank()      OVER w AS INTEGER) AS rk,
           CAST(dense_rank() OVER w AS INTEGER) AS drk,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist()    OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey LIMIT 100
    """,
    tags=("tier-b", "win_rank"),
)
def window_ntile_rank_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / rank / dense_rank / percent_rank / cume_dist in one pass —
    Spark evaluates all five in a single Window operator (one sort)."""
    t = register_tables(spark, sf_dir, ("customer",))
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.rank().over(w).cast("int").alias("rk"),
            F.dense_rank().over(w).cast("int").alias("drk"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "window_first_last_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           CAST(count(*) OVER w AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey LIMIT 100
    """,
    tags=("tier-b", "win_frame"),
)
def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame (last_value needs the
    explicit frame — the default frame stops at CURRENT ROW)."""
    t = register_tables(spark, sf_dir, ("orders",))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.count(F.lit(1)).over(w).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
        .limit(100)
    )
