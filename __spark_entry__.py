"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``sql4pandas_spark.queries`` — this module only
adapts the catalog to the driver's entry-point shape, so the declared set,
the pytest differential harness (tests/test_catalog_differential.py), and
bench.py can never drift apart.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql4pandas_spark.queries import load_catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q1_pricing_summary) on /root/testdata/sf0.001."""
    catalog = load_catalog()
    return catalog["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in load_catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible declared query."""
    return {
        name: spec.oracle
        for name, spec in load_catalog().items()
        if spec.oracle is not None
    }
