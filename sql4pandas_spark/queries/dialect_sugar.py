"""Dialect-sugar catalog entries: QUALIFY, ``* EXCLUDE``, GROUP BY ALL.

The reference dialect (DuckDB-flavored, SURVEY.md §3.1) grew three pieces
of select-sugar its users lean on daily: the QUALIFY clause (filter on
window results without a subquery), ``* EXCLUDE (cols)`` (star minus a
few columns), and ``GROUP BY ALL`` (group by every non-aggregate select
expression). Spark has no QUALIFY spelling and spells column-subtraction
``* EXCEPT``; GROUP BY ALL is shared syntax. The transpiler closes the
gap structurally (functions/transpile.py: ``_rewrite_qualify`` — the
subquery-plus-WHERE form with the predicate computed inside, so alias
references, inline windows, and non-selected base columns all work —
and ``_rewrite_exclude``).

Both entries run their oracle's OWN statement text through
``Engine.sql(dialect="duckdb")``, so the hash match proves
statement-level front-end parity, not operator parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql4pandas_spark.queries.catalog import query
from sql4pandas_spark.sources.parquet import register_tables

_QUALIFY_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS rn
FROM orders
QUALIFY rn <= 3
ORDER BY o_custkey, rn, o_orderkey
LIMIT 500
"""

_EXCLUDE_GBALL_SQL = """
WITH slim AS (
  SELECT * EXCLUDE (o_orderstatus, o_custkey)
  FROM orders WHERE o_orderkey % 7 = 3)
SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS yr,
       count(*) AS n, round(sum(o_totalprice), 2) AS rev
FROM slim
GROUP BY ALL
ORDER BY o_orderpriority, yr
"""


def _engine_run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    from sql4pandas_spark.engine import Engine

    register_tables(spark, sf_dir, ("orders",))
    return Engine(spark).sql(sql, dialect="duckdb").df


@query(
    "qualify_top3_orders",
    oracle=_QUALIFY_SQL,
    tags=("tier-a", "sql_frontend", "transpile", "win_rank", "topk_per_group"),
)
def qualify_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via the QUALIFY clause — the reference
    dialect's window filter, which Spark's parser rejects outright. The
    transpiler rewrites it into the subquery form with the predicate
    evaluated inside (lateral alias resolution covers the ``rn <= 3``
    alias reference), which Catalyst then optimizes with the same
    WindowGroupLimit push-down as the hand-written form
    (queries/windows.window_top3_orders_per_customer): per-partition
    top-k before any full sort. Oracle runs the identical text natively
    in DuckDB; the deterministic (custkey, rn, orderkey) order + LIMIT
    keeps the row set stable across scale factors."""
    return _engine_run(spark, sf_dir, _QUALIFY_SQL)


@query(
    "exclude_groupby_all_orders",
    oracle=_EXCLUDE_GBALL_SQL,
    tags=("tier-a", "sql_frontend", "transpile", "agg_group", "project"),
)
def exclude_groupby_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``* EXCLUDE`` + ``GROUP BY ALL`` in one statement: the CTE drops
    two columns star-wise (transpiled to Spark's
    ``* EXCEPT``; column pruning then reaches the scan either way — the
    sugar is for humans, the plan is identical), and the aggregate
    groups by ALL non-aggregate select expressions (shared syntax, runs
    native on both engines). year() int-width divergence is normalized
    with the shared CAST (SURVEY.md §2.12 #9)."""
    return _engine_run(spark, sf_dir, _EXCLUDE_GBALL_SQL)
