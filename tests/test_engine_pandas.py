"""The reference-parity surface (SURVEY.md §1.1/§3.1): pandas in → SQL →
pandas out, cursor fetch protocol, and the upgrade cases the reference could
not do (pandas frame joined against a parquet view in one statement)."""

from __future__ import annotations

import pandas as pd
import pytest

from sql4pandas_spark.engine import Engine
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine(spark)
    eng.register_fixtures(SF_SMALL)
    return eng


def test_register_pandas_and_query(engine):
    pdf = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    engine.register("tiny", pdf)
    out = engine.sql("SELECT v FROM tiny WHERE k >= 2 ORDER BY k").to_pandas()
    assert list(out.v) == ["b", "c"]


def test_case_when_headline_feature(engine):
    """CASE WHEN was a headline reference feature (np.select — SURVEY §2.2)."""
    engine.register("scores", pd.DataFrame({"s": [10, 55, 90]}))
    out = engine.sql(
        "SELECT CASE WHEN s >= 80 THEN 'hi' WHEN s >= 50 THEN 'mid' ELSE 'lo' END AS b "
        "FROM scores ORDER BY s"
    ).to_pandas()
    assert list(out.b) == ["lo", "mid", "hi"]


def test_pandas_joins_parquet_view(engine):
    """A registered pandas frame joins a parquet-backed fixture view — the
    reference needed everything in one process; here it's one logical plan."""
    seg = pd.DataFrame({"c_mktsegment": ["BUILDING"], "boost": [2.0]})
    engine.register("seg_boost", seg)
    out = engine.sql(
        """
        SELECT count(*) AS n
        FROM customer c JOIN seg_boost b ON c.c_mktsegment = b.c_mktsegment
        """
    ).to_pandas()
    assert out.n[0] > 0


def test_cursor_protocol(engine):
    cur = engine.cursor()
    cur.execute("SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 5")
    assert cur.description[0][0] == "c_custkey"
    assert cur.fetchone() == (0,)
    assert [r[0] for r in cur.fetchmany(2)] == [1, 2]
    assert [r[0] for r in cur.fetchall()] == [3, 4]
    assert cur.fetchone() is None


def test_null_semantics_upgrade(engine):
    """pandas NaN becomes SQL NULL (deliberate upgrade over NaN arithmetic)."""
    engine.register("with_nan", pd.DataFrame({"x": [1.0, float("nan"), 3.0]}))
    out = engine.sql(
        "SELECT count(*) AS n_rows, count(x) AS n_vals, "
        "coalesce(sum(x), 0) AS total FROM with_nan"
    ).to_pandas()
    assert out.n_rows[0] == 3 and out.n_vals[0] == 2 and out.total[0] == 4.0


def test_tables_listing(engine):
    assert {"customer", "orders", "lineitem"} <= set(engine.tables())


def test_result_explain_returns_formatted_plan(engine):
    plan = engine.sql("SELECT 1 AS x").explain()
    assert "Physical Plan" in plan
    plan2 = engine.sql("SELECT 1 AS x").explain("simple")
    assert "Physical Plan" in plan2
