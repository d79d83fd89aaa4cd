"""Recursive-CTE catalog entries: the SQL front end's fixpoint surface.

The reference's identity is "SQL strings in, frames out" (SURVEY.md §1.1);
``WITH RECURSIVE`` is the one ANSI construct in that surface Spark cannot
run as-is in its deduplicating (``UNION``) form. Both entries here execute
the SAME statement text on both engines — DuckDB natively, Spark through
``plans/recursive.run_recursive_sql`` (the UNION form via the semi-naive
fixpoint loop, the UNION ALL form via Catalyst's native recursion) — so a
hash match proves the executor IS the missing engine feature, not an
operator that happens to agree with one query.

Scale: the fixpoint loop's per-round work is one join of a checkpointed
frontier against a once-materialized edge frame plus a distinct+anti-join
on the accumulated row set — the textbook semi-naive closure plan; nothing
data-sized touches the driver (plans/recursive.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql4pandas_spark.queries.catalog import query
from sql4pandas_spark.sources.parquet import register_tables

#: Reachability over a CYCLIC directed graph (two deterministic edge arms
#: over nation keys; the doubling arm alone is a functional graph whose
#: cycles make UNION ALL recursion diverge — the dedup is the termination
#: argument, which is exactly the form Spark rejects natively).
Q_REACHABILITY = """
WITH RECURSIVE edges AS (
  SELECT n_nationkey AS src, (n_nationkey * 2 + 1) % 25 AS dst FROM nation
  UNION ALL
  SELECT n_nationkey, (n_nationkey + 7) % 25 FROM nation
  WHERE n_nationkey % 2 = 0),
reach(origin, node) AS (
  SELECT n_nationkey, n_nationkey FROM nation WHERE n_regionkey = 0
  UNION
  SELECT r.origin, e.dst FROM reach r JOIN edges e ON r.node = e.src)
SELECT origin, count(*) AS n_reachable, min(node) AS lo, max(node) AS hi
FROM reach GROUP BY origin ORDER BY origin
"""

#: Ancestor walk up the implicit binary-tree part hierarchy (parent =
#: key // 2): linear recursion with a shrinking key, the UNION ALL form
#: Spark 4 runs natively — the entry pins that the executor DISPATCHES to
#: Catalyst's recursion for it instead of wrapping it in driver rounds.
Q_HIERARCHY = """
WITH RECURSIVE anc(pkey, anc_key, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey % 97 = 1
  UNION ALL
  SELECT a.pkey, a.anc_key // 2, a.depth + 1 FROM anc a WHERE a.anc_key > 1)
SELECT pkey, max(depth) AS height, min(anc_key) AS root
FROM anc GROUP BY pkey ORDER BY pkey
"""


def _run(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], sql: str) -> DataFrame:
    from sql4pandas_spark.functions.transpile import to_spark_sql
    from sql4pandas_spark.plans.recursive import run_recursive_sql

    register_tables(spark, sf_dir, tables)
    return run_recursive_sql(spark, to_spark_sql(sql, "duckdb"))


@query(
    "recursive_cte_reachability",
    oracle=Q_REACHABILITY,
    tags=("tier-a", "subquery_corr", "sql_frontend", "recursive_cte", "graph"),
)
def recursive_cte_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure from the region-0 nations over a cyclic edge set,
    via ``WITH RECURSIVE … UNION`` — the statement Spark's native recursion
    rejects (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) and DuckDB runs
    natively. The Spark side is the IDENTICAL text through the semi-naive
    fixpoint executor; per-origin reach counts differ (the even-key second
    edge arm breaks symmetry), so the hash pins the closure row set, not
    just convergence."""
    return _run(spark, sf_dir, ("nation",), Q_REACHABILITY)


@query(
    "recursive_cte_hierarchy",
    oracle=Q_HIERARCHY,
    tags=("tier-a", "subquery_corr", "sql_frontend", "recursive_cte"),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part ancestor-chain height and root over the binary-tree
    hierarchy implicit in the part keys, via ``WITH RECURSIVE … UNION
    ALL`` — dispatched to Catalyst's NATIVE recursive-CTE execution (the
    executor only intercepts the UNION form). Every chain must terminate
    at root 1 with height = floor(log2(pkey)); the oracle replays the walk
    natively in DuckDB."""
    return _run(spark, sf_dir, ("part",), Q_HIERARCHY)
