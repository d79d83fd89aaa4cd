"""Property-based differential hardening (SURVEY.md §5.3.4): hypothesis
generates random filter predicates + group-key subsets over `orders`; the
SAME ANSI SQL text runs on Spark and DuckDB and must agree exactly.

Grammar is deliberately restricted to the cross-engine-safe surface the
declared catalog relies on (§2.12): rounded double aggregates, tie-broken
ordering, no NULL-producing constructs (the fixture has no NULLs and inner
predicates can't create them).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sql4pandas_spark.sources.parquet import register_tables
from tests.conftest import SF_SMALL, assert_frames_match


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_tables(spark, SF_SMALL, ("orders",))

_NUM_COLS = ["o_totalprice", "o_custkey", "o_orderkey"]
_STR_COLS = {
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
}
_GROUP_COLS = ["o_orderstatus", "o_orderpriority", "year(o_orderdate)"]


@st.composite
def predicates(draw) -> str:
    clauses = []
    for _ in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(["num", "str", "in", "between"]))
        if kind == "num":
            col = draw(st.sampled_from(_NUM_COLS))
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "<>"]))
            val = draw(st.integers(0, 400_000))
            clauses.append(f"{col} {op} {val}")
        elif kind == "str":
            col = draw(st.sampled_from(list(_STR_COLS)))
            val = draw(st.sampled_from(_STR_COLS[col]))
            clauses.append(f"{col} = '{val}'")
        elif kind == "in":
            col = draw(st.sampled_from(list(_STR_COLS)))
            vals = draw(
                st.lists(st.sampled_from(_STR_COLS[col]), min_size=1, max_size=3, unique=True)
            )
            quoted = ", ".join(f"'{v}'" for v in vals)
            clauses.append(f"{col} IN ({quoted})")
        else:
            col = draw(st.sampled_from(_NUM_COLS))
            lo = draw(st.integers(0, 200_000))
            hi = lo + draw(st.integers(0, 200_000))
            clauses.append(f"{col} BETWEEN {lo} AND {hi}")
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    return joiner.join(clauses)


@st.composite
def group_keys(draw) -> list[str]:
    return draw(
        st.lists(st.sampled_from(_GROUP_COLS), min_size=1, max_size=2, unique=True)
    )


@given(pred=predicates(), keys=group_keys())
@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_filter_group_agg_matches_duckdb(spark, duck, pred, keys):
    key_list = ", ".join(keys)
    aliases = ", ".join(f"{k} AS k{i}" for i, k in enumerate(keys))
    sql = (
        f"SELECT {aliases}, count(*) AS n, round(sum(o_totalprice), 2) AS s "
        f"FROM orders WHERE {pred} GROUP BY {key_list} ORDER BY {key_list}"
    )
    actual = spark.sql(sql).toPandas()
    expected = duck.execute(sql).fetch_df()
    # year() dtype differs (int32 vs int64) — align before exact compare
    for c in actual.columns:
        if str(actual[c].dtype) == "int32":
            actual[c] = actual[c].astype("int64")
    assert_frames_match(actual, expected, f"property[{sql}]")


@pytest.fixture(scope="module", autouse=True)
def _join_views(spark):
    register_tables(spark, SF_SMALL, ("orders", "customer"))


@given(pred=predicates(), how=st.sampled_from(["JOIN", "LEFT JOIN"]))
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_agg_matches_duckdb(spark, duck, pred, how):
    """Random filtered equi-joins (inner + left) with aggregation — the same
    ANSI text on both engines. LEFT JOIN exercises the NULL-count path
    (count(col) skips NULLs in both)."""
    sql = (
        "SELECT c_mktsegment AS seg, count(o_orderkey) AS n, "
        "round(coalesce(sum(o_totalprice), 0), 2) AS s "
        f"FROM customer {how} orders ON o_custkey = c_custkey AND ({pred}) "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )
    actual = spark.sql(sql).toPandas()
    expected = duck.execute(sql).fetch_df()
    assert_frames_match(actual, expected, f"join-property[{sql}]")


@given(k=st.integers(1, 5), keys=group_keys())
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_topk_matches_duckdb(spark, duck, k, keys):
    """Random top-k-per-partition windows, tie-broken by the unique order
    key so the row set is engine-independent."""
    part = keys[0]
    sql = (
        "SELECT * FROM ("
        f"  SELECT o_orderkey, {part} AS p, o_totalprice,"
        f"         row_number() OVER (PARTITION BY {part} "
        "                             ORDER BY o_totalprice DESC, o_orderkey) AS rn"
        "  FROM orders) t "
        f"WHERE rn <= {k} ORDER BY p, rn"
    )
    actual = spark.sql(sql).toPandas()
    expected = duck.execute(sql).fetch_df()
    for c in actual.columns:
        if str(actual[c].dtype) == "int32":
            actual[c] = actual[c].astype("int64")
    assert_frames_match(actual, expected, f"window-property[{sql}]")


@given(keys=group_keys(), agg=st.sampled_from(["sum", "min", "max", "count"]))
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_running_frame_matches_duckdb(spark, duck, keys, agg):
    """Random running-frame window aggregates (ROWS UNBOUNDED PRECEDING →
    CURRENT ROW), ordered by the unique key so frames are deterministic.
    Aggregates run over exact integer cents — running float sums accumulate
    in engine-specific order (Spark streaming frame vs DuckDB segment tree),
    so a double column here would diverge on round-boundary values; the
    point of this test is frame semantics, not float associativity."""
    part = keys[0]
    sql = (
        f"SELECT o_orderkey, {part} AS p, "
        f"       CAST({agg}(CAST(round(o_totalprice * 100) AS BIGINT)) "
        f"            OVER (PARTITION BY {part} "
        "              ORDER BY o_orderkey "
        "              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r "
        "FROM orders ORDER BY o_orderkey LIMIT 500"
    )
    actual = spark.sql(sql).toPandas()
    expected = duck.execute(sql).fetch_df()
    for c in actual.columns:
        if str(actual[c].dtype) == "int32":
            actual[c] = actual[c].astype("int64")
    assert_frames_match(actual, expected, f"frame-property[{sql}]")


@given(keys=group_keys(), off=st.integers(1, 3))
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_lag_matches_duckdb(spark, duck, keys, off):
    """Random lag offsets with an explicit default — NULL-free, so the only
    cross-engine risk is frame/ordering semantics, which must agree."""
    part = keys[0]
    sql = (
        f"SELECT o_orderkey, "
        f"       round(o_totalprice - lag(o_totalprice, {off}, 0.0) "
        f"             OVER (PARTITION BY {part} ORDER BY o_orderkey), 2) AS delta "
        "FROM orders ORDER BY o_orderkey LIMIT 500"
    )
    actual = spark.sql(sql).toPandas()
    expected = duck.execute(sql).fetch_df()
    assert_frames_match(actual, expected, f"lag-property[{sql}]")


@given(jt=st.sampled_from(["INNER", "LEFT", "RIGHT", "FULL"]), pred=predicates())
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_types_match_duckdb(spark, duck, jt, pred):
    """Random inner/outer joins between customer and a filtered orders
    subquery — per-segment row counts plus count(o_orderkey) (non-NULL only)
    pin the null-extension semantics of each join type. coalesce guards the
    group key so NULL keys can't diverge on ordering."""
    register_tables(spark, SF_SMALL, ("customer",))
    sql = (
        "SELECT coalesce(c_mktsegment, '?') AS seg, count(*) AS n, "
        "       count(o_orderkey) AS n_orders "
        f"FROM customer c {jt} JOIN "
        f"(SELECT * FROM orders WHERE {pred}) o ON c.c_custkey = o.o_custkey "
        "GROUP BY 1 ORDER BY 1"
    )
    actual = spark.sql(sql).toPandas()
    expected = duck.execute(sql).fetch_df()
    for c in actual.columns:
        if str(actual[c].dtype) == "int32":
            actual[c] = actual[c].astype("int64")
    assert_frames_match(actual, expected, f"join-property[{sql}]")
