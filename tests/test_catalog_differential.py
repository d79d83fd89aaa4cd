"""The local mirror of the driver's t2 gate: every catalog query that has a
DuckDB oracle runs on BOTH engines at sf0.001 and must match exactly
(columns, row counts, values, dtypes). A query cannot ship in
__spark_entry__.py without passing here first (SURVEY.md §5.3)."""

from __future__ import annotations

import pytest

#: whole-catalog sweep / heavy property tier — deselected by default so
#: the standard run fits the driver's verification window (pytest.ini);
#: runs via `-m slow` and in the pre-handoff full-suite ritual.
pytestmark = pytest.mark.slow


from sql4pandas_spark.queries import load_catalog
from tests.conftest import SF_SMALL, assert_frames_match

CATALOG = load_catalog()
SQL_CHECKED = sorted(n for n, s in CATALOG.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in CATALOG.items() if s.oracle is None)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_matches_duckdb_oracle(spark, duck, name):
    spec = CATALOG[name]
    actual = spec.build(spark, SF_SMALL).toPandas()
    expected = duck.execute(spec.oracle).fetch_df()
    assert_frames_match(actual, expected, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_are_deterministic(spark, name):
    """No oracle → at minimum: runs, returns rows, and is run-to-run
    deterministic (the driver records row counts; flaky counts would flap)."""
    spec = CATALOG[name]
    first = spec.build(spark, SF_SMALL).toPandas()
    second = spec.build(spark, SF_SMALL).toPandas()
    assert len(first) > 0, f"{name}: empty result"
    assert first.equals(second), f"{name}: nondeterministic result"
