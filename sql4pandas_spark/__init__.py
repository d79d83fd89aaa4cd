"""sql4pandas_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference library ``keeganmccallum/sql4pandas``
(SQL over in-memory pandas DataFrames), re-expressed Spark-first.

The reference is a thin SQL compiler over pandas (see SURVEY.md §1/§3 — the
checkout at /root/reference/ is empty this round, so parity claims cite
SURVEY.md's reconstruction, not file:line). This package keeps the same user
contract — register named tables, run SQL, get results back as pandas — but
the execution engine is Spark SQL / Catalyst / Tungsten, so the same queries
scale from one laptop DataFrame to a 1000-executor cluster over 100 TB of
parquet.

Public surface:

- :class:`Engine` — the reference-style entry point: ``register(name, pdf)``,
  ``sql(q)``, DB-API-ish cursor. pandas in, pandas out.
- :func:`get_spark` — pinned local SparkSession factory.
- :func:`register_tables` — register the fixture parquet tables as temp views.
- :mod:`sql4pandas_spark.queries` — the declared-query catalog (the t2
  contract: every entry has a Spark builder and, where expressible, a DuckDB
  oracle SQL string).
- :mod:`sql4pandas_spark.operators` — LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal) built as pure
  DataFrame→DataFrame transforms.
- :mod:`sql4pandas_spark.streaming` — Structured-Streaming window/watermark
  operators with batch-equivalence helpers.
"""

from sql4pandas_spark.engine import Engine
from sql4pandas_spark.session import configure_session, get_spark
from sql4pandas_spark.sources.parquet import TABLES, register_tables, table

__all__ = [
    "Engine",
    "TABLES",
    "configure_session",
    "get_spark",
    "register_tables",
    "table",
]
