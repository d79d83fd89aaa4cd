"""The declared-query catalog — the single source of truth for the t2 contract.

Every operator id from SURVEY.md §2 that is "done" has exactly one entry here:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
ANSI-SQL-expressible, the equivalent DuckDB oracle SQL. ``__spark_entry__.py``,
the pytest differential harness, and ``bench.py`` all read this registry, so a
query cannot be declared to the driver without also being locally tested and
benchable.

Parity rules baked into every entry (SURVEY.md §2.12): float aggregates are
rounded (sum→2dp, avg/sim→4dp), ORDER BY+LIMIT always tie-breaks on a unique
key, computed columns carry identical aliases on both sides, int-width
divergences (Spark year()→int vs DuckDB year()→bigint, …) are normalized with
explicit casts.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: Spark builder + optional DuckDB oracle."""

    name: str
    build: QueryBuilder
    oracle: str | None  # DuckDB SQL, or None → driver runs rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: name -> spec; populated by the @query decorator at import time.
CATALOG: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryBuilder], QueryBuilder]:
    """Register a query builder in the catalog (decorator)."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def load_catalog() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registry fills) and return it."""
    # Imports deferred so `import sql4pandas_spark` stays cheap.
    from sql4pandas_spark.queries import (  # noqa: F401
        functions_lib,
        pipeline,
        relational,
        streaming_queries,
        udfs,
        windows,
    )

    return CATALOG
