"""Guard the driver's 50-entry evidence window against waste.

The correctness driver hash-checks exactly the FIRST 50 entries of
``load_catalog()`` each round, so every slot occupied by an already-proven
query is a slot a less-evidenced query doesn't get. Round 4 burned its whole
window re-verifying round 3's results because ``DRIVER_PRIORITY`` wasn't
rotated; this test makes a wasteful window fail loudly.

Evidence rule (generalized round 7): a query is "settled" once it has
>= 2 green rounds (err-free, row-matched) in the CORRECTNESS_r*.json files
— one green round is worth re-confirming, two is settled evidence.  Green
counts SATURATE at the settled threshold for window comparisons: a third or
fourth green round adds nothing, which keeps the rule satisfiable in the
terminal state where every entry is settled (driver evidence necessarily
accrues to whatever sits in the window, so an unsaturated "window must hold
the strictly least-evidenced" rule would go permanently red the round after
it is first satisfied — the round-6 failure mode).  The invariant: no entry
OUTSIDE the window may have fewer saturated greens than any entry INSIDE
it.  When everything is settled, any window is valid and slot choice falls
to the rotation recipe in catalog.py (code-freshness ties).
"""

from __future__ import annotations

import glob
import json
import os

from sql4pandas_spark.queries.catalog import DRIVER_PRIORITY, load_catalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50
SETTLED = 2  # green rounds at which more driver evidence stops mattering


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


def test_window_holds_the_least_evidenced_entries():
    """No entry outside the window may be needier (fewer saturated green
    rounds) than any entry inside it.  Subsumes the old rules: a 0-green
    entry can never wait behind a once-green one, and a <2-green entry can
    never wait behind a settled one; once ALL entries are settled every
    saturated count is equal and any window satisfies this vacuously."""
    greens = _green_rounds()
    ordered = list(load_catalog())
    window, waiting = ordered[:WINDOW], ordered[WINDOW:]

    def sat(name: str) -> int:
        return min(greens.get(name, 0), SETTLED)

    most_evidenced_inside = max(sat(n) for n in window)
    starved = [n for n in waiting if sat(n) < most_evidenced_inside]
    bumpable = [n for n in window if sat(n) == most_evidenced_inside]
    assert not starved, (
        f"{len(starved)} entries outside the driver window have less "
        f"evidence (<{most_evidenced_inside} saturated green rounds) than "
        f"window occupants {bumpable[:5]}… — rotate DRIVER_PRIORITY "
        f"(sql4pandas_spark/queries/catalog.py): {starved}"
    )
