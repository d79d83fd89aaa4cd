"""Semantics pins for the recursive-CTE fixpoint executor
(plans/recursive.py): UNION-distinct closure on cyclic graphs, dispatch to
native Catalyst recursion for UNION ALL, NULL-safe termination, loud
divergence/shape errors, and temp-view hygiene."""

from __future__ import annotations

import pytest

from sql4pandas_spark.plans.recursive import (
    MAX_ROUNDS,
    RecursionLimitExceeded,
    parse_with_recursive,
    run_recursive_sql,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------- parser


def test_parse_non_recursive_statement_returns_none():
    assert parse_with_recursive("SELECT 1") is None
    assert parse_with_recursive("WITH t AS (SELECT 1) SELECT * FROM t") is None


def test_parse_extracts_cte_chain_and_rest():
    p = parse_with_recursive(
        "WITH RECURSIVE a (x) AS (SELECT 1), b AS (SELECT 2) SELECT * FROM b"
    )
    assert [c.name for c in p.ctes] == ["a", "b"]
    assert p.ctes[0].cols == ("x",)
    assert p.ctes[1].cols is None
    assert p.rest.strip() == "SELECT * FROM b"


def test_parse_ignores_keywords_inside_literals_and_comments():
    p = parse_with_recursive(
        "WITH RECURSIVE a AS (SELECT ' , AS ( ' AS s -- , fake AS (\n)"
        " SELECT * FROM a"
    )
    assert [c.name for c in p.ctes] == ["a"]
    assert "fake" not in [c.name for c in p.ctes]


# ------------------------------------------------- fixpoint semantics


def test_union_distinct_terminates_on_cycle(spark):
    # mod-4 cycle: UNION ALL would re-enumerate forever; UNION closes.
    df = run_recursive_sql(
        spark,
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n+1) % 4 FROM t) "
        "SELECT n FROM t",
    )
    assert _rows(df) == [(0,), (1,), (2,), (3,)]


def test_union_all_dispatches_to_native_catalyst(spark):
    df = run_recursive_sql(
        spark,
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t "
        "WHERE n < 5) SELECT n FROM t",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UnionLoop" in plan, "UNION ALL recursion must stay native"
    assert _rows(df) == [(1,), (2,), (3,), (4,), (5,)]


def test_union_vs_union_all_diverge_on_diamond(spark):
    # diamond a->b, a->c, b->d, c->d: ALL counts both paths into d,
    # DISTINCT collapses them — the textbook bag/set recursion split.
    edges = (
        "SELECT * FROM VALUES ('a','b'), ('a','c'), ('b','d'), ('c','d') "
        "AS e(src, dst)"
    )
    all_df = run_recursive_sql(
        spark,
        f"WITH RECURSIVE e AS ({edges}), walk(node) AS ("
        "SELECT 'a' UNION ALL SELECT e.dst FROM walk w JOIN e ON w.node = e.src)"
        " SELECT count(*) AS c FROM walk WHERE node = 'd'",
    )
    set_df = run_recursive_sql(
        spark,
        f"WITH RECURSIVE e AS ({edges}), walk(node) AS ("
        "SELECT 'a' UNION SELECT e.dst FROM walk w JOIN e ON w.node = e.src)"
        " SELECT count(*) AS c FROM walk WHERE node = 'd'",
    )
    assert all_df.collect()[0][0] == 2
    assert set_df.collect()[0][0] == 1


def test_null_rows_cannot_spin_the_loop(spark):
    # NULL = NULL is never true in an equi-anti-join; the executor's
    # null-safe dedup must converge in one round, not MAX_ROUNDS.
    df = run_recursive_sql(
        spark,
        "WITH RECURSIVE t(n) AS (SELECT CAST(NULL AS INT) UNION "
        "SELECT n FROM t) SELECT count(*) AS c FROM t",
        max_rounds=3,
    )
    assert df.collect()[0][0] == 1


def test_two_independent_recursive_ctes(spark):
    df = run_recursive_sql(
        spark,
        "WITH RECURSIVE a(n) AS (SELECT 1 UNION SELECT (n+1) % 3 FROM a), "
        "b(m) AS (SELECT 10 UNION SELECT 10 + (m+1) % 2 FROM b) "
        "SELECT (SELECT count(*) FROM a) AS ca, (SELECT count(*) FROM b) AS cb",
    )
    assert df.collect()[0][0:2] == (3, 2)


def test_step_type_alignment_to_seed_schema(spark):
    # seed INT, step produces BIGINT (n+1 over BIGINT literal): positional
    # cast back to the seed schema keeps the accumulator's schema stable.
    df = run_recursive_sql(
        spark,
        "WITH RECURSIVE t(n) AS (SELECT CAST(1 AS INT) UNION "
        "SELECT CAST(n + 1 AS BIGINT) FROM t WHERE n < 3) SELECT n FROM t",
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["int"]
    assert _rows(df) == [(1,), (2,), (3,)]


def test_plain_ctes_before_and_after_fixpoint(spark):
    df = run_recursive_sql(
        spark,
        "WITH RECURSIVE base AS (SELECT id FROM range(6)), "
        "edges AS (SELECT id AS src, CAST((id+2) % 6 AS BIGINT) AS dst FROM base), "
        "reach(src, dst) AS (SELECT id, id FROM base UNION "
        "SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), "
        "post AS (SELECT src, count(*) AS n FROM reach GROUP BY src) "
        "SELECT * FROM post ORDER BY src",
    )
    assert _rows(df) == [(i, 3) for i in range(6)]  # parity classes of 3


# ------------------------------------------------------- loud failures


def test_divergent_recursion_hits_round_cap(spark):
    with pytest.raises(RecursionLimitExceeded, match="did not converge"):
        run_recursive_sql(
            spark,
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT n+1 FROM t) "
            "SELECT count(*) FROM t",
            max_rounds=5,
        )
    assert MAX_ROUNDS >= 64  # default generous for log-depth closures


def test_forward_reference_rejected(spark):
    with pytest.raises(ValueError, match="forward/"):
        run_recursive_sql(
            spark,
            "WITH RECURSIVE a(n) AS (SELECT m FROM b UNION SELECT n FROM a), "
            "b(m) AS (SELECT 1) SELECT * FROM a",
        )


def test_mixed_separators_rejected(spark):
    with pytest.raises(ValueError, match="mixed UNION"):
        run_recursive_sql(
            spark,
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT n+1 FROM t "
            "WHERE n < 2 UNION ALL SELECT n+2 FROM t WHERE n < 2) "
            "SELECT * FROM t",
        )


def test_cte_name_as_inner_alias_is_plain_cte(spark):
    # the CTE's name appearing only as a table alias inside its own body
    # is the documented false positive of token-level reference checks —
    # it must run as a plain CTE, not enter (or be rejected by) the loop.
    df = run_recursive_sql(
        spark,
        "WITH RECURSIVE e AS "
        "(SELECT * FROM VALUES (1, 2), (3, 4) AS e(src, dst)) "
        "SELECT sum(src + dst) AS s FROM e",
    )
    assert df.collect()[0][0] == 10


def test_genuinely_seedless_recursion_fails_loudly(spark):
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        run_recursive_sql(
            spark,
            "WITH RECURSIVE zz_t(n) AS (SELECT n FROM zz_t UNION SELECT 1) "
            "SELECT * FROM zz_t",
        )


def test_cte_shadowing_registered_table_rejected(spark):
    from sql4pandas_spark.sources.parquet import register_tables

    import tests.conftest as cf

    register_tables(spark, cf.SF_SMALL, ("nation",))
    with pytest.raises(ValueError, match="shadow"):
        run_recursive_sql(
            spark,
            "WITH RECURSIVE nation(n) AS (SELECT 1 UNION "
            "SELECT (n+1) % 2 FROM nation) SELECT * FROM nation",
        )


def test_temp_views_dropped_after_success_and_failure(spark):
    run_recursive_sql(
        spark,
        "WITH RECURSIVE inv AS (SELECT 1 AS k), "
        "loop_t(n) AS (SELECT k FROM inv UNION SELECT (n+1) % 3 FROM loop_t) "
        "SELECT count(*) FROM loop_t",
    )
    with pytest.raises(RecursionLimitExceeded):
        run_recursive_sql(
            spark,
            "WITH RECURSIVE inv AS (SELECT 1 AS k), "
            "loop_t(n) AS (SELECT k FROM inv UNION SELECT n+1 FROM loop_t) "
            "SELECT count(*) FROM loop_t",
            max_rounds=3,
        )
    names = {t.name for t in spark.catalog.listTables()}
    assert "inv" not in names and "loop_t" not in names


def test_constraint_propagation_conf_restored(spark):
    key = "spark.sql.constraintPropagation.enabled"
    before = spark.conf.get(key, "true")
    run_recursive_sql(
        spark,
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n+1) % 2 FROM t) "
        "SELECT count(*) FROM t",
    )
    assert spark.conf.get(key, "true") == before


# --------------------------------------------------- engine integration


def test_engine_runs_duckdb_dialect_recursion(spark):
    from sql4pandas_spark.engine import Engine

    eng = Engine(spark)
    out = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n+1) % 4 FROM t) "
        "SELECT count(*) AS c, min(n) AS lo FROM t",
        dialect="duckdb",
    ).to_pandas()
    assert out.iloc[0]["c"] == 4 and out.iloc[0]["lo"] == 0


def test_catalog_entries_match_duckdb(spark, duck):
    """The two catalog entries hash-match their oracles end-to-end (the
    same differential the driver runs)."""
    import tests.conftest as cf
    from sql4pandas_spark.queries.catalog import load_catalog

    cat = load_catalog()
    for name in ("recursive_cte_reachability", "recursive_cte_hierarchy"):
        spec = cat[name]
        got = cf.normalize(spec.build(spark, cf.SF_SMALL).toPandas())
        exp = cf.normalize(duck.execute(spec.oracle).fetchdf())
        cf.assert_frames_match(got, exp, name)
