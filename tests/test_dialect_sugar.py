"""QUALIFY / ``* EXCLUDE`` / GROUP BY ALL dialect-sugar pins
(functions/transpile._rewrite_qualify / _rewrite_exclude and the
queries/dialect_sugar.py entries)."""

from __future__ import annotations

import pytest

from sql4pandas_spark.functions.transpile import transpile_duckdb


def _flat(s: str) -> str:
    return " ".join(s.split())


# ------------------------------------------------------------ rewrites


def test_qualify_alias_predicate_rewrites_to_subquery():
    out = _flat(
        transpile_duckdb(
            "SELECT id, row_number() OVER (ORDER BY id) AS rn FROM t "
            "QUALIFY rn <= 2"
        )
    )
    assert out.startswith("SELECT * EXCEPT (__qualify) FROM (")
    assert "(rn <= 2) AS __qualify" in out
    assert out.endswith(") WHERE __qualify")


def test_qualify_inline_window_and_tail_preserved():
    out = _flat(
        transpile_duckdb(
            "SELECT id FROM t QUALIFY row_number() OVER (ORDER BY id) = 1 "
            "ORDER BY id LIMIT 3"
        )
    )
    assert "AS __qualify" in out
    assert out.endswith("WHERE __qualify ORDER BY id LIMIT 3")


def test_qualify_inside_cte_rewrites_innermost_scope():
    out = _flat(
        transpile_duckdb(
            "WITH c AS (SELECT id, rank() OVER (ORDER BY id) AS r FROM t "
            "QUALIFY r < 2) SELECT count(*) FROM c"
        )
    )
    assert out.startswith("WITH c AS (SELECT * EXCEPT (__qualify) FROM (")
    assert out.endswith("SELECT count(*) FROM c")


def test_qualify_keyword_in_literal_untouched():
    src = "SELECT ' QUALIFY x ' AS s FROM t"
    assert transpile_duckdb(src) == src


def test_qualify_distinct_rejected():
    with pytest.raises(ValueError, match="SELECT DISTINCT"):
        transpile_duckdb(
            "SELECT DISTINCT id, row_number() OVER (ORDER BY id) AS rn "
            "FROM t QUALIFY rn <= 2"
        )


def test_qualify_group_by_all_rejected():
    with pytest.raises(ValueError, match="GROUP BY ALL"):
        transpile_duckdb(
            "SELECT g, count(*) AS n, rank() OVER (ORDER BY g) AS r "
            "FROM t GROUP BY ALL QUALIFY r = 1"
        )


def test_exclude_parenthesized_and_bare():
    assert (
        transpile_duckdb("SELECT * EXCLUDE (a, b) FROM t")
        == "SELECT * EXCEPT (a, b) FROM t"
    )
    assert (
        transpile_duckdb("SELECT t.* EXCLUDE a FROM t")
        == "SELECT t.* EXCEPT (a) FROM t"
    )


def test_exclude_only_rewrites_star_adjacent():
    # EXCLUDE as an ordinary identifier (a column named exclude) stays.
    src = "SELECT exclude FROM t"
    assert transpile_duckdb(src) == src


# ------------------------------------------------------- end-to-end


@pytest.mark.parametrize(
    "name", ["qualify_top3_orders", "exclude_groupby_all_orders"]
)
def test_entries_match_duckdb(spark, duck, name):
    import tests.conftest as cf
    from sql4pandas_spark.queries.catalog import load_catalog

    spec = load_catalog()[name]
    got = cf.normalize(spec.build(spark, cf.SF_SMALL).toPandas())
    exp = cf.normalize(duck.execute(spec.oracle).fetchdf())
    cf.assert_frames_match(got, exp, name)


def test_qualify_plans_with_window_group_limit(spark):
    """The rewritten QUALIFY must keep Catalyst's rank-filter pushdown:
    WindowGroupLimit trims to per-partition top-k BEFORE the full window
    sort — the difference between a scalable top-k-per-group and a full
    repartition of every row at 100 TB."""
    import tests.conftest as cf
    from sql4pandas_spark.queries.catalog import load_catalog

    df = load_catalog()["qualify_top3_orders"].build(spark, cf.SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_qualify_equals_handwritten_window_filter(spark):
    """Differential: QUALIFY through the engine == the hand-written
    subquery form, row for row (same session, same fixture)."""
    from sql4pandas_spark.engine import Engine
    from sql4pandas_spark.sources.parquet import register_tables

    import tests.conftest as cf

    register_tables(spark, cf.SF_SMALL, ("orders",))
    eng = Engine(spark)
    sugar = eng.sql(
        "SELECT o_custkey, o_orderkey, "
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn "
        "FROM orders QUALIFY rn = 1",
        dialect="duckdb",
    ).df
    plain = spark.sql(
        "SELECT * FROM (SELECT o_custkey, o_orderkey, "
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn "
        "FROM orders) WHERE rn = 1"
    )
    assert sorted(map(tuple, sugar.collect())) == sorted(
        map(tuple, plain.collect())
    )
