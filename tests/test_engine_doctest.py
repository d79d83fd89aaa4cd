"""The Engine quickstart docstring IS the core API contract — run it as a
doctest so "register two pandas frames, join+group via SQL, fetch pandas /
cursor rows" stays executable, not aspirational (round-7 verdict item #7).
"""

from __future__ import annotations

import doctest

import sql4pandas_spark.engine as engine_mod


def test_engine_quickstart_doctest(spark):
    # the fixture keeps session startup out of the doctest and guarantees
    # Engine() resolves to the shared test session
    results = doctest.testmod(
        engine_mod, verbose=False, raise_on_error=False, report=True
    )
    assert results.attempted >= 8, "quickstart doctest shrank — keep it real"
    assert results.failed == 0
