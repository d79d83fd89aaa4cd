"""Round-6 property-based differentials: the grammar corners the round-5
file leaves untested — set operations (bag + set semantics), ROLLUP/CUBE
grouping-set expansion, CASE expressions, and scalar-function chains.

Same discipline as test_property_differential.py: one ANSI SQL text runs on
BOTH engines, restricted to the cross-engine-safe surface (§2.12) — exact
integer aggregates (cents), tie-broken ordering, NULLs only where the
construct itself introduces them (rollup totals, disambiguated via
grouping())."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from sql4pandas_spark.sources.parquet import register_tables
from tests.conftest import SF_SMALL, assert_frames_match


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_tables(spark, SF_SMALL, ("orders",))


_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_STR_COLS = {
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
}


@st.composite
def predicates(draw) -> str:
    clauses = []
    for _ in range(draw(st.integers(1, 2))):
        kind = draw(st.sampled_from(["num", "str"]))
        if kind == "num":
            op = draw(st.sampled_from(["<", ">", "<=", ">="]))
            val = draw(st.integers(0, 400_000))
            clauses.append(f"o_totalprice {op} {val}")
        else:
            col = draw(st.sampled_from(list(_STR_COLS)))
            val = draw(st.sampled_from(_STR_COLS[col]))
            clauses.append(f"{col} = '{val}'")
    return draw(st.sampled_from([" AND ", " OR "])).join(clauses)


def _run_both(spark, duck, sql, tag):
    actual = spark.sql(sql).toPandas()
    expected = duck.execute(sql).fetch_df()
    for c in actual.columns:
        if str(actual[c].dtype) == "int32":
            actual[c] = actual[c].astype("int64")
    assert_frames_match(actual, expected, f"{tag}[{sql}]")


@given(
    op=st.sampled_from(
        ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
    ),
    p1=predicates(),
    p2=predicates(),
)
@settings(max_examples=18, **_SETTINGS)
def test_random_setops_match_duckdb(spark, duck, op, p1, p2):
    """Random set operations between two filtered projections — the ALL
    variants pin bag semantics (multiplicity arithmetic), the plain ones
    set semantics; the outer GROUP BY makes content (not just cardinality)
    comparable."""
    sql = (
        "SELECT o_orderstatus AS st, o_orderpriority AS pr, count(*) AS n "
        "FROM ("
        f"  SELECT o_orderstatus, o_orderpriority FROM orders WHERE {p1}"
        f"  {op} "
        f"  SELECT o_orderstatus, o_orderpriority FROM orders WHERE {p2}"
        ") t GROUP BY 1, 2 ORDER BY 1, 2"
    )
    _run_both(spark, duck, sql, "setop-property")


@given(
    form=st.sampled_from(["ROLLUP", "CUBE"]),
    keys=st.permutations(["o_orderstatus", "o_orderpriority"]),
    pred=predicates(),
)
@settings(max_examples=12, **_SETTINGS)
def test_random_rollup_cube_matches_duckdb(spark, duck, form, keys, pred):
    """Random ROLLUP/CUBE over both key orders: grouping() disambiguates a
    rollup-total NULL from a (non-existent here) data NULL, and the sum
    runs in exact integer cents so super-aggregate rows can't drift.

    Non-empty inputs only — this test FOUND the §2.12 pitfall that Spark
    returns zero rows for grouping sets over an empty input while DuckDB
    (per ANSI: the () grouping set behaves like a global aggregate) emits
    the grand-total row; see test_rollup_empty_input_divergence below,
    which pins the divergence itself.
    """
    n_in = duck.execute(f"SELECT count(*) FROM orders WHERE {pred}").fetchone()[0]
    assume(n_in > 0)
    k1, k2 = keys
    sql = (
        f"SELECT CAST(grouping({k1}) AS BIGINT) AS g1, "
        f"       CAST(grouping({k2}) AS BIGINT) AS g2, "
        f"       coalesce({k1}, '<all>') AS k1, coalesce({k2}, '<all>') AS k2, "
        "       count(*) AS n, "
        "       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        "         AS cents "
        f"FROM orders WHERE {pred} "
        f"GROUP BY {form}({k1}, {k2}) ORDER BY g1, g2, k1, k2"
    )
    _run_both(spark, duck, sql, "rollup-property")


def test_rollup_empty_input_divergence(spark, duck):
    """Pin the engine divergence the property test discovered (round 6):
    grouping sets over an EMPTY input. ANSI treats the () grouping set as a
    global aggregate (one row, count 0); DuckDB does that, Spark returns no
    rows. Declared queries must therefore never put ROLLUP/CUBE over a
    possibly-empty input without guaranteeing rows (§2.12 pitfall #8). If
    either engine changes behavior, this test fails and §2.12 needs an
    update."""
    sql = (
        "SELECT grouping(s) AS g, count(*) AS n "
        "FROM (SELECT 'a' AS s WHERE 1=0) GROUP BY ROLLUP(s)"
    )
    assert spark.sql(sql).count() == 0  # Spark: no rows
    assert len(duck.execute(sql).fetchall()) == 1  # DuckDB: grand-total row


@given(
    t1=st.integers(10_000, 200_000),
    t2=st.integers(200_001, 400_000),
    pred=predicates(),
)
@settings(max_examples=12, **_SETTINGS)
def test_random_case_buckets_match_duckdb(spark, duck, t1, t2, pred):
    """Random CASE thresholds — bucket membership must agree exactly (both
    engines see the same doubles; only comparison semantics are at stake)."""
    sql = (
        "SELECT CASE WHEN o_totalprice < "
        f"{t1} THEN 'lo' WHEN o_totalprice < {t2} THEN 'mid' "
        "ELSE 'hi' END AS bucket, count(*) AS n "
        f"FROM orders WHERE {pred} GROUP BY 1 ORDER BY 1"
    )
    _run_both(spark, duck, sql, "case-property")


@given(
    fns=st.lists(
        st.sampled_from(["upper", "lower", "reverse", "trim"]),
        min_size=1,
        max_size=3,
    ),
    k=st.integers(1, 6),
)
@settings(max_examples=12, **_SETTINGS)
def test_random_string_fn_chains_match_duckdb(spark, duck, fns, k):
    """Random compositions of cross-engine string functions over substr —
    the same chain must produce identical group keys on both engines."""
    expr = f"substr(o_orderpriority, 1, {k})"
    for fn in fns:
        expr = f"{fn}({expr})"
    sql = (
        f"SELECT {expr} AS key, length({expr}) AS l, count(*) AS n "
        "FROM orders GROUP BY 1, 2 ORDER BY 1, 2"
    )
    _run_both(spark, duck, sql, "strfn-property")


@given(pred=predicates(), hv=st.integers(1, 50))
@settings(max_examples=12, **_SETTINGS)
def test_random_having_matches_duckdb(spark, duck, pred, hv):
    """Random HAVING thresholds over an exact count — the post-aggregation
    filter path (§2.4 having) under random group survival."""
    sql = (
        "SELECT o_orderpriority AS pr, count(*) AS n "
        f"FROM orders WHERE {pred} "
        f"GROUP BY 1 HAVING count(*) >= {hv} ORDER BY 1"
    )
    _run_both(spark, duck, sql, "having-property")
