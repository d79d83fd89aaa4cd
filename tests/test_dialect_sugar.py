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
    # alias reference expanded to its defining expression: no lateral
    # column alias survives into the injected predicate
    assert "((row_number() OVER (ORDER BY id)) <= 2) AS __qualify" in out
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


# ----------------------------------------------------- subquery hoist


def test_hof_scalar_subquery_hoists_to_cross_join():
    out = _flat(
        transpile_duckdb(
            "SELECT list_cosine_similarity(v, (SELECT v FROM q WHERE k = 0)) "
            "AS sim FROM t"
        )
    )
    assert "CROSS JOIN (SELECT (SELECT v FROM q WHERE k = 0) AS __sq0) __sqt0" in out
    assert "__sqt0.__sq0" in out
    assert "(SELECT v FROM q WHERE k = 0))" not in out.split("CROSS JOIN")[0]


def test_hof_subquery_in_where_clause_hoists():
    out = _flat(
        transpile_duckdb(
            "SELECT id FROM t WHERE list_sum((SELECT vec FROM q WHERE k = 1)) > 2"
        )
    )
    # join attaches before WHERE, reference replaces the subquery
    assert out.index("CROSS JOIN") < out.index("WHERE")
    assert "__sqt0.__sq0" in out


def test_hof_subquery_inside_nested_select_scope():
    out = _flat(
        transpile_duckdb(
            "SELECT * FROM (SELECT list_sum((SELECT v FROM q)) AS s FROM t) z"
        )
    )
    # hoist stays inside the inner subquery's scope
    inner = out[out.index("(SELECT") : out.rindex(") z")]
    assert "CROSS JOIN" in inner


def test_plain_scalar_subquery_not_hoisted():
    src = "SELECT (SELECT max(x) FROM q) AS m FROM t"
    assert transpile_duckdb(src) == src


# ------------------------------------------------------------ asof


def test_asof_backward_rewrites_to_lateral_desc():
    out = _flat(
        transpile_duckdb(
            "SELECT p.id, c.ts FROM purchases p ASOF LEFT JOIN clicks c "
            "ON p.user_id = c.user_id AND p.ts >= c.ts"
        )
    )
    assert "LEFT JOIN LATERAL (SELECT * FROM clicks c WHERE" in out
    assert "ORDER BY c.ts DESC LIMIT 1) c ON true" in out


def test_asof_forward_and_inner_variants():
    fwd = _flat(
        transpile_duckdb(
            "SELECT p.id FROM p ASOF JOIN c ON p.k = c.k AND p.ts <= c.ts"
        )
    )
    assert "JOIN LATERAL" in fwd and "LEFT JOIN" not in fwd
    assert "ORDER BY c.ts ASC LIMIT 1" in fwd


def test_asof_reversed_inequality_normalizes_direction():
    # c.ts <= p.ts spells the same backward join as p.ts >= c.ts
    out = _flat(
        transpile_duckdb(
            "SELECT p.id FROM p ASOF LEFT JOIN c ON p.k = c.k AND c.ts <= p.ts"
        )
    )
    assert "ORDER BY c.ts DESC LIMIT 1" in out


def test_asof_subquery_right_side_keeps_alias():
    out = _flat(
        transpile_duckdb(
            "SELECT p.id FROM p ASOF LEFT JOIN (SELECT * FROM ev) c "
            "ON p.k = c.k AND p.ts >= c.ts"
        )
    )
    assert "LATERAL (SELECT * FROM (SELECT * FROM ev) c WHERE" in out


def test_asof_as_plain_identifier_untouched():
    src = "SELECT asof FROM t WHERE asof > 1"
    assert transpile_duckdb(src) == src


def test_asof_right_and_full_rejected():
    with pytest.raises(ValueError, match="ASOF RIGHT"):
        transpile_duckdb(
            "SELECT 1 FROM p ASOF RIGHT JOIN c ON p.k = c.k AND p.ts >= c.ts"
        )


def test_asof_needs_exactly_one_inequality():
    with pytest.raises(ValueError, match="exactly one inequality"):
        transpile_duckdb(
            "SELECT 1 FROM p ASOF JOIN c ON p.k = c.k"
        )
    with pytest.raises(ValueError, match="exactly one inequality"):
        transpile_duckdb(
            "SELECT 1 FROM p ASOF JOIN c "
            "ON p.ts >= c.ts AND p.t2 >= c.t2"
        )


def test_asof_e2e_matches_duckdb(spark, duck):
    """The rewritten ASOF executes on Spark and equals DuckDB's native
    ASOF row-for-row, and the decorrelation keeps WindowGroupLimit."""
    from sql4pandas_spark.sources.parquet import register_tables

    import tests.conftest as cf

    register_tables(spark, cf.SF_SMALL, ("events",))
    q = """
    SELECT p.event_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id LIMIT 100
    """
    sdf = spark.sql(transpile_duckdb(q))
    got = sorted(map(tuple, sdf.collect()))
    exp = sorted(map(tuple, duck.execute(q).fetchall()))
    assert [(a, (b.replace(tzinfo=None) if b is not None else None)) for a, b in got] == [
        (a, b) for a, b in exp
    ]
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


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


_QUALIFY_GRID = [
    # alias reference, per-group rank
    "SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey"
    " ORDER BY o_orderkey) AS rn FROM orders QUALIFY rn <= 2",
    # inline window, no alias
    "SELECT o_orderkey FROM orders QUALIFY"
    " rank() OVER (ORDER BY o_orderkey) <= 5",
    # predicate over a base column NOT in the select list
    "SELECT o_orderkey FROM orders QUALIFY"
    " row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1"
    " AND o_custkey % 2 = 0",
    # boolean combination of two window expressions
    "SELECT o_orderkey FROM orders QUALIFY"
    " row_number() OVER (ORDER BY o_orderkey) <= 10 AND"
    " row_number() OVER (ORDER BY o_orderkey DESC) <= 10000",
    # after WHERE and GROUP BY (windows over aggregated rows)
    "SELECT o_custkey, count(*) AS n FROM orders WHERE o_orderkey % 3 = 0"
    " GROUP BY o_custkey QUALIFY rank() OVER (ORDER BY n DESC, o_custkey)"
    " <= 4",
    # with ORDER BY + LIMIT tail
    "SELECT o_orderkey, lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev"
    " FROM orders QUALIFY prev IS NOT NULL ORDER BY o_orderkey LIMIT 7",
    # inside a CTE, aggregated outside
    "WITH t AS (SELECT o_custkey, o_orderkey, row_number() OVER"
    " (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn FROM orders"
    " QUALIFY rn = 1) SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT)"
    " AS s FROM t",
]


@pytest.mark.parametrize("stmt", _QUALIFY_GRID)
def test_qualify_grid_matches_duckdb(spark, duck, stmt):
    """Every QUALIFY idiom in the grid produces identical rows on both
    engines — the rewrite's semantics differential, beyond the two
    catalog entries' shapes."""
    from sql4pandas_spark.sources.parquet import register_tables

    import tests.conftest as cf

    register_tables(spark, cf.SF_SMALL, ("orders",))
    got = sorted(map(tuple, spark.sql(transpile_duckdb(stmt)).collect()))
    exp = sorted(map(tuple, duck.execute(stmt).fetchall()))
    assert got == exp, stmt


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
