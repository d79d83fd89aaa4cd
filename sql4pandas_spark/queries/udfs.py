"""UDF / UDAF / UDTF surface (SURVEY.md §2.8).

The reference's "UDF story" is all of Python (it executes inside pandas);
Spark's equivalents, fastest-first: pandas_udf (Arrow-batched, vectorized),
applyInPandas (grouped map), pandas_udf GROUPED_AGG (UDAF), Python UDTF,
and row-at-a-time F.udf (kept for completeness, never for hot paths).

Each declared query's UDF mirrors a SQL expression so the DuckDB oracle can
verify values — the UDF machinery is what's under test, not novel math.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sql4pandas_spark.queries.catalog import query
from sql4pandas_spark.sources.parquet import register_tables


def _net_price_udf():
    """Vectorized scalar UDF: whole Arrow batches in/out (~10-100× faster than
    row-at-a-time Python UDFs — the only acceptable Python in a hot path).
    Created lazily: @pandas_udf needs an active SparkSession to parse the DDL
    return type, so decoration happens at query-build time, not import."""

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        # No pandas-side rounding: Series.round is half-to-even (banker's),
        # while Spark/DuckDB round() is half-away-from-zero — callers wrap
        # the result in F.round so both engines apply the same rule.
        return price * (1.0 - discount)

    return net_price


@query(
    "udf_pandas_net_price",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS net
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 50
    """,
    tags=("tier-b", "udf_scalar_pandas"),
)
def udf_pandas_net_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir, ("lineitem",))
    net_price = _net_price_udf()
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                net_price(F.col("l_extendedprice"), F.col("l_discount")), 2
            ).alias("net"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(50)
    )


@query(
    "udf_grouped_zscore",
    oracle="""
    SELECT c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS z
    FROM customer ORDER BY c_custkey LIMIT 100
    """,
    tags=("tier-b", "udf_grouped_map"),
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: z-score account balance within each market
    segment. Each group arrives as one pandas DataFrame on an executor —
    the pattern for per-group logic Spark can't express (here it CAN, which
    is what lets DuckDB verify the UDF machinery end-to-end)."""
    t = register_tables(spark, sf_dir, ("customer",))

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        # raw z here; rounding happens Spark-side (F.round) because pandas
        # Series.round is half-to-even vs Spark/DuckDB half-away-from-zero
        return pd.DataFrame(
            {"c_custkey": pdf["c_custkey"], "z": (pdf["c_acctbal"] - mu) / sd}
        )

    return (
        t["customer"]
        .groupBy("c_mktsegment")
        .applyInPandas(zscore, schema="c_custkey long, z double")
        .select("c_custkey", F.round("z", 4).alias("z"))
        .orderBy("c_custkey")
        .limit(100)
    )


def _weighted_avg_udf():
    """GROUPED_AGG pandas UDF (UDAF): weighted mean per group (lazy for the
    same session-at-decoration-time reason as _net_price_udf)."""

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return weighted_avg


@query(
    "udaf_weighted_avg_price",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("tier-b", "udaf_pandas"),
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir, ("lineitem",))
    weighted_avg = _weighted_avg_udf()
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias("w_avg"))
        .orderBy("l_returnflag")
    )


@query(
    "udtf_word_rows",
    oracle="""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
    WHERE w <> '' GROUP BY w ORDER BY n DESC, word LIMIT 10
    """,
    tags=("tier-b", "udtf"),
)
def udtf_word_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row → many output rows, used via
    LATERAL join in SQL. Mirrors explode so DuckDB's unnest verifies it."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class ExplodeWords:
        def eval(self, text: str):
            for w in text.split(" "):
                if w:
                    yield (w,)

    register_tables(spark, sf_dir, ("documents",))
    spark.udtf.register("explode_words", ExplodeWords)
    return spark.sql(
        """
        SELECT t.word, count(*) AS n
        FROM documents d, LATERAL explode_words(d.text) t
        GROUP BY t.word ORDER BY n DESC, t.word LIMIT 10
        """
    )


@query(
    "udf_python_rowwise",
    oracle="""
    SELECT c_custkey, upper(c_name) || '/' || c_mktsegment AS tag
    FROM customer ORDER BY c_custkey LIMIT 30
    """,
    tags=("tier-b", "udf_python"),
)
def udf_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — completeness only. Ser/de cost per row makes
    this the slow path; prefer pandas_udf or built-ins everywhere else."""
    t = register_tables(spark, sf_dir, ("customer",))
    tag = F.udf(lambda name, seg: f"{name.upper()}/{seg}", "string")
    return (
        t["customer"]
        .select("c_custkey", tag("c_name", "c_mktsegment").alias("tag"))
        .orderBy("c_custkey")
        .limit(30)
    )


@query(
    "udtf_table_arg_summary",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("tier-b", "udtf", "udtf_table_arg"),
)
def udtf_table_arg_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF over a TABLE argument (Spark 4): the function
    receives whole partitions of `documents` (PARTITION BY lang routes every
    row of a language to one instance), accumulates state across eval()
    calls, and emits one summary row in terminate() — the SQL-surfaced
    equivalent of applyInPandas, verified against the plain GROUP BY oracle.
    Scale shape: PARTITION BY is a hash shuffle on lang; state is one
    accumulator per instance, not a buffered partition."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang: string, n_docs: bigint, total_chars: bigint")
    class LangSummary:
        def __init__(self):
            self._lang, self._n, self._chars = None, 0, 0

        def eval(self, row):
            self._lang = row["lang"]
            self._n += 1
            self._chars += int(row["n_chars"])

        def terminate(self):
            if self._lang is not None:
                yield (self._lang, self._n, self._chars)

    register_tables(spark, sf_dir, ("documents",))
    spark.udtf.register("lang_summary", LangSummary)
    return spark.sql(
        "SELECT * FROM lang_summary(TABLE(documents) PARTITION BY lang) ORDER BY lang"
    )
