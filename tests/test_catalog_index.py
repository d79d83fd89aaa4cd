"""SURVEY.md §2.13 (the generated catalog index) must match the live
catalog — a stale index would send the coverage audit to wrong builders or
hide new entries. Regenerate with:  python tools/catalog_index.py

The greens ledger is compared at the section's OWN committed round stamp,
not at whatever CORRECTNESS files happen to be on disk: the driver writes
CORRECTNESS_r{N}.json AFTER the round's final commit, so a disk-state
comparison was structurally red at every judge evaluation (rounds 8-10).
The stamp may lag the newest disk file by at most one round — more means
the builder actually forgot to regenerate.
"""

from __future__ import annotations

import os
import re

from tools.catalog_index import BEGIN, END, SURVEY, latest_round, render


def _committed_section() -> str:
    with open(SURVEY) as f:
        text = f.read()
    assert BEGIN in text and END in text, "SURVEY.md §2.13 missing"
    return text[text.index(BEGIN) : text.index(END) + len(END)]


def test_survey_catalog_index_in_sync():
    committed = _committed_section()
    m = re.search(r"through round \*\*(\d+)\*\*", committed)
    assert m, "SURVEY.md §2.13 missing its round stamp — regenerate"
    stamp = int(m.group(1))
    assert committed == render(through_round=stamp), (
        "SURVEY.md §2.13 is stale — run: python tools/catalog_index.py"
    )
    assert os.path.exists(SURVEY)


def test_survey_catalog_index_stamp_not_ancient():
    """The stamp may trail the newest on-disk CORRECTNESS file by exactly
    one round (the driver's post-commit write); a gap of two or more means
    a whole round passed without regenerating the ledger."""
    m = re.search(r"through round \*\*(\d+)\*\*", _committed_section())
    assert m is not None
    assert latest_round() - int(m.group(1)) <= 1, (
        "SURVEY.md §2.13 ledger is more than one round behind the "
        "CORRECTNESS files on disk — run: python tools/catalog_index.py"
    )
