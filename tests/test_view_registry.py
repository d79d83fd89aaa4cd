"""register_tables' memoized view registration (round-14 optimization).

Each ``createOrReplaceTempView`` is a ~6-8 ms driver↔JVM catalog round-trip;
register_tables is called at the top of every catalog builder, so round 14
memoizes it per (session, view name, sf_dir). These tests pin the semantics
that make the memo safe:

- a repeat registration for the same sf_dir is a no-op (the view still
  resolves to the same data);
- switching sf_dir re-registers (the dual-scale oracle gate runs both
  sf0.001 and sf0.01 through one session);
- anything that replaces a view behind register_tables' back —
  ``Engine.register`` and friends — invalidates the memo, so the next
  register_tables call restores the fixture view instead of trusting a
  stale memo entry.
"""

from __future__ import annotations

import pandas as pd

from sql4pandas_spark.engine import Engine
from sql4pandas_spark.sources import parquet as P

from tests.conftest import SF_SMALL

SF_MID = "/root/testdata/sf0.01"


def _count(spark, table: str) -> int:
    return spark.sql(f"SELECT count(*) AS n FROM {table}").collect()[0].n


def test_repeat_registration_is_memoized(spark):
    P.register_tables(spark, SF_SMALL, ("nation",))
    n1 = _count(spark, "nation")
    registry = P._view_registry[spark]
    assert registry["nation"] == SF_SMALL
    # repeat: memo hit, view still resolves identically
    P.register_tables(spark, SF_SMALL, ("nation",))
    assert _count(spark, "nation") == n1


def test_sf_dir_switch_reregisters(spark):
    P.register_tables(spark, SF_SMALL, ("nation",))
    try:
        P.register_tables(spark, SF_MID, ("customer",))
        n_mid = _count(spark, "customer")
        P.register_tables(spark, SF_SMALL, ("customer",))
        n_small = _count(spark, "customer")
        assert P._view_registry[spark]["customer"] == SF_SMALL
        # sf0.01 customer is strictly larger than sf0.001's
        assert n_mid > n_small
    finally:
        P.invalidate_registered_views(spark)
        P.register_tables(spark, SF_SMALL)


def test_engine_register_invalidates_fixture_name(spark):
    P.register_tables(spark, SF_SMALL, ("nation",))
    n_fixture = _count(spark, "nation")
    try:
        eng = Engine(spark)
        eng.register("nation", pd.DataFrame({"n_nationkey": [1, 2, 3]}))
        assert _count(spark, "nation") == 3  # user frame shadows the fixture
        # the memo was invalidated, so this restores the real view
        P.register_tables(spark, SF_SMALL, ("nation",))
        assert _count(spark, "nation") == n_fixture
    finally:
        P.invalidate_registered_views(spark)
        P.register_tables(spark, SF_SMALL)


def test_invalidate_all_and_named(spark):
    P.register_tables(spark, SF_SMALL, ("nation", "region"))
    reg = P._view_registry[spark]
    P.invalidate_registered_views(spark, ("nation",))
    assert "nation" not in reg and "region" in reg
    P.invalidate_registered_views(spark)
    assert not reg
    # fresh registration works after a full invalidation
    P.register_tables(spark, SF_SMALL, ("nation",))
    assert _count(spark, "nation") > 0
