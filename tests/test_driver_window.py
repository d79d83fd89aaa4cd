"""Guard the driver's 50-entry evidence window against waste.

The correctness driver hash-checks exactly the FIRST 50 entries of
``load_catalog()`` each round, so every slot occupied by an already-proven
query is a slot a never-verified query doesn't get. Round 4 burned its whole
window re-verifying round 3's results because ``DRIVER_PRIORITY`` wasn't
rotated; this test makes an un-rotated window fail loudly.

A query is "already proven" once it has >= 2 green rounds (err-free,
row-matched) in the committed CORRECTNESS_r*.json files — one green round is
worth re-confirming after related code changes, two is settled evidence.
"""

from __future__ import annotations

import glob
import json
import os

from sql4pandas_spark.queries.catalog import DRIVER_PRIORITY, load_catalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _green_rounds() -> dict[str, int]:
    counts: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                if not row.get("err") and row.get("rows_match"):
                    counts[name] = counts.get(name, 0) + 1
    return counts


def test_window_is_exactly_the_priority_prefix():
    ordered = list(load_catalog())
    assert ordered[: len(DRIVER_PRIORITY)] == list(DRIVER_PRIORITY)
    assert len(ordered) >= WINDOW


def test_window_spends_no_slots_on_settled_queries():
    greens = _green_rounds()
    window = list(load_catalog())[:WINDOW]
    settled = [n for n in window if greens.get(n, 0) >= 2]
    assert not settled, (
        f"{len(settled)} of the driver's {WINDOW} verification slots are "
        f"occupied by queries already green in >=2 committed rounds — rotate "
        f"DRIVER_PRIORITY (sql4pandas_spark/queries/catalog.py): {settled}"
    )


def test_window_prioritizes_unproven_queries():
    """If anything in the catalog has zero green rounds, the window must not
    leave it waiting behind a once-green query (one green round < none)."""
    greens = _green_rounds()
    ordered = list(load_catalog())
    window, waiting = ordered[:WINDOW], ordered[WINDOW:]
    starved = [n for n in waiting if greens.get(n, 0) == 0]
    bumpable = [n for n in window if greens.get(n, 0) >= 1]
    assert not (starved and bumpable), (
        f"never-green queries {starved} are outside the window while "
        f"already-green {bumpable} occupy slots"
    )
