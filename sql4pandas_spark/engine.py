"""The reference-style user API: register named tables, execute SQL, fetch
pandas (SURVEY.md §1.1 — the reference is a SQL layer over in-memory pandas
DataFrames with a DB-API-ish cursor; checkout empty this round, reconstruction
per SURVEY.md §3.1).

Same contract, Spark engine underneath:

    eng = Engine()
    eng.register("people", pandas_df)          # Arrow upload, temp view
    out = eng.sql("SELECT name, age FROM people WHERE age > 30")
    out.to_pandas()                            # Arrow download
    cur = eng.cursor(); cur.execute(q); cur.fetchall()

Because registration creates a temp view over a Spark DataFrame, registered
pandas frames, parquet tables, and streaming sources all join freely in one
SQL statement — that is the upgrade over the reference, where everything had
to fit in one process's memory.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from sql4pandas_spark.session import configure_session, get_spark
from sql4pandas_spark.sources.parquet import register_tables


class Result:
    """Lazy query result: a Spark DataFrame with pandas-flavored accessors."""

    def __init__(self, df: DataFrame):
        self.df = df

    @property
    def is_streaming(self) -> bool:
        """True when the statement read a streaming view — call :meth:`drain`
        (or hand ``df`` to ``writeStream``) instead of collecting."""
        return self.df.isStreaming

    def drain(self, mode: str | None = None, timeout_sec: int = 120) -> "Result":
        """Run a streaming result to completion over everything currently on
        disk (``trigger(availableNow=True)``) and return the final table as a
        batch Result. The deterministic way to get SQL-over-stream answers in
        a test or backfill; a production job would ``writeStream`` instead.

        ``mode=None`` (default) picks the output mode automatically:
        'complete' for aggregating results, 'append' for plain
        SELECT/filter/join streams (Spark rejects 'complete' for those).
        A plan with no Aggregate node anywhere drains straight in append
        mode; otherwise 'complete' is attempted and, if Spark rejects it
        because the Aggregate sits on a batch branch (e.g. a stream-static
        join against an aggregated dim), the drain falls back to 'append' —
        a substring probe alone can't tell which branch the Aggregate is
        on. Pass an explicit mode to override — e.g. 'update' for a
        watermarked aggregation you want incrementally."""
        from pyspark.errors import AnalysisException

        from sql4pandas_spark.streaming.windows import run_available_now

        if mode is not None:
            return Result(
                run_available_now(self.df, mode=mode, timeout_sec=timeout_sec)
            )
        analyzed = self.df._jdf.queryExecution().analyzed().toString()
        if "Aggregate" not in analyzed:
            return Result(
                run_available_now(self.df, mode="append", timeout_sec=timeout_sec)
            )
        try:
            return Result(
                run_available_now(self.df, mode="complete", timeout_sec=timeout_sec)
            )
        except AnalysisException:
            return Result(
                run_available_now(self.df, mode="append", timeout_sec=timeout_sec)
            )

    def to_pandas(self) -> pd.DataFrame:
        """Materialize via Arrow (spark.sql.execution.arrow.pyspark.enabled)."""
        return self.df.toPandas()

    def explain(self, mode: str = "formatted") -> str:
        """Return the query plan as a string (default 'formatted': the
        physical plan with codegen stages — the thing to read before
        running anything at scale). Modes as in DataFrame.explain."""
        return self.df.sparkSession._jvm.PythonSQLUtils.explainString(
            self.df._jdf.queryExecution(), mode
        )

    def collect(self) -> list[Any]:
        return self.df.collect()

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def __repr__(self) -> str:  # pragma: no cover
        return f"Result({self.df.schema.simpleString()})"


class Cursor:
    """DB-API-flavored cursor (execute / fetchone / fetchmany / fetchall /
    description), mirroring the reference's cursor-style surface."""

    def __init__(self, engine: "Engine"):
        self._engine = engine
        self._rows: list[tuple] | None = None
        self._pos = 0
        self.description: list[tuple] | None = None

    def execute(self, sql: str) -> "Cursor":
        df = self._engine.sql(sql).df
        self.description = [
            (f.name, f.dataType.simpleString(), None, None, None, None, f.nullable)
            for f in df.schema.fields
        ]
        self._rows = [tuple(r) for r in df.collect()]
        self._pos = 0
        return self

    def fetchone(self) -> tuple | None:
        if self._rows is None or self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchmany(self, size: int = 1) -> list[tuple]:
        if self._rows is None:
            return []
        out = self._rows[self._pos : self._pos + size]
        self._pos += len(out)
        return out

    def fetchall(self) -> list[tuple]:
        if self._rows is None:
            return []
        out = self._rows[self._pos :]
        self._pos = len(self._rows)
        return out


class Engine:
    """SQL over named tables; pandas in, pandas out; Spark underneath.

    The reference-parity contract, executable (tests/test_engine_doctest.py
    runs this docstring):

    >>> import pandas as pd
    >>> from sql4pandas_spark import Engine
    >>> eng = Engine()
    >>> eng.register("people", pd.DataFrame({
    ...     "name": ["ada", "bob", "cyd", "dan"],
    ...     "dept_id": [1, 1, 2, 2],
    ...     "age": [35, 28, 41, 33]}))
    >>> eng.register("depts", pd.DataFrame({
    ...     "dept_id": [1, 2], "dept": ["eng", "ops"]}))
    >>> out = eng.sql('''
    ...     SELECT d.dept, count(*) AS n, avg(p.age) AS avg_age
    ...     FROM people p JOIN depts d USING (dept_id)
    ...     WHERE p.age >= 33
    ...     GROUP BY d.dept ORDER BY d.dept''')
    >>> [tuple(r) for r in out.collect()]
    [('eng', 1, 35.0), ('ops', 2, 37.0)]
    >>> out.to_pandas().shape
    (2, 3)
    >>> cur = eng.cursor().execute("SELECT name FROM people ORDER BY age DESC")
    >>> cur.fetchone()
    ('cyd',)
    >>> cur.fetchmany(2)
    [('ada',), ('dan',)]
    >>> sorted(t for t in eng.tables() if t in ("people", "depts"))
    ['depts', 'people']
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = configure_session(spark) if spark is not None else get_spark()

    # -- registration ------------------------------------------------------
    def register(self, name: str, data: pd.DataFrame | DataFrame) -> None:
        """Register a pandas or Spark DataFrame under a table name.

        pandas frames upload via Arrow (columnar, zero row-wise pickling).
        Note the NULL-semantics upgrade: pandas NaN/NaT become real SQL NULLs.
        """
        from sql4pandas_spark.sources.parquet import invalidate_registered_views

        df = (
            self.spark.createDataFrame(data)
            if isinstance(data, pd.DataFrame)
            else data
        )
        df.createOrReplaceTempView(name)
        # the user frame may shadow a fixture table's name — drop the
        # register_tables memo so the next fixture registration re-binds
        invalidate_registered_views(self.spark, (name,))

    def register_parquet(self, name: str, path: str) -> None:
        from sql4pandas_spark.sources.parquet import (
            invalidate_registered_views,
            normalize_ntz,
        )

        normalize_ntz(self.spark.read.parquet(path)).createOrReplaceTempView(name)
        invalidate_registered_views(self.spark, (name,))

    def register_fixtures(self, sf_dir: str) -> None:
        """Register the ten fixture tables from a scale-factor directory."""
        register_tables(self.spark, sf_dir)

    def register_stream(self, name: str, stream: DataFrame) -> None:
        """Register a STREAMING DataFrame (``spark.readStream...``) as a view.

        ``Engine.sql`` statements over the view return a streaming Result —
        the same SQL text that works on a batch view incrementalizes under
        MicroBatchExecution (windowed aggs, stream-stream joins, stream-static
        joins against registered batch tables). Drain deterministically with
        ``Result.drain()``; watermark first (``stream.withWatermark``) when
        state must stay bounded on a real unbounded source.
        """
        if not stream.isStreaming:
            raise ValueError(
                f"register_stream({name!r}) expects a streaming DataFrame "
                "(spark.readStream...); use register() for batch inputs"
            )
        from sql4pandas_spark.sources.parquet import invalidate_registered_views

        stream.createOrReplaceTempView(name)
        invalidate_registered_views(self.spark, (name,))

    def register_events_stream(self, sf_dir: str, name: str = "events_stream") -> None:
        """Register the fixture events table as a streaming view (timestamp
        normalization matching the batch reader)."""
        from sql4pandas_spark.streaming.windows import read_events_stream

        self.register_stream(name, read_events_stream(self.spark, sf_dir))

    # -- execution ---------------------------------------------------------
    def sql(self, statement: str, dialect: str | None = None) -> Result:
        """Execute SQL → lazy Result (Catalyst parses/optimizes/plans).

        ``dialect="duckdb"`` accepts the reference-dialect spelling
        through the full dialect front end (functions/transpile.py):
        function renames, argument-shape rewrites (string_split,
        list_sum, regexp flags, …), the bracket grammar (TYPE[], list
        literals, 1-based access, comprehensions), struct literals, **,
        parameterized intervals, in-parens IGNORE NULLS, and literal
        re-escaping, plus the structural rewrites (QUALIFY, * EXCLUDE,
        ASOF JOIN syntax, scalar-subquery hoisting out of HOF
        arguments) — the same statement text that runs on the reference
        engine runs here unchanged, and plans like hand-written Spark
        SQL (pushdown/pruning plan-asserted). Proven at catalog width by
        tools/transpile_sweep.py: every oracled statement in the catalog
        executes verbatim with a matching value hash (empty skip list).
        Default: Spark SQL.

        ``WITH RECURSIVE`` statements whose recursion uses deduplicating
        ``UNION`` — the fixpoint-closure form Spark's native recursion
        rejects — run through the semi-naive iterative executor
        (plans/recursive.py); their Result is materialized rather than
        lazy, because driver-coordinated iteration has to execute to know
        the fixpoint. Everything else stays lazy.
        """
        from sql4pandas_spark.functions.transpile import to_spark_sql
        from sql4pandas_spark.plans.recursive import run_recursive_sql

        return Result(
            run_recursive_sql(self.spark, to_spark_sql(statement, dialect))
        )

    def cursor(self) -> Cursor:
        return Cursor(self)

    def tables(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]
