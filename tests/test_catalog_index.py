"""SURVEY.md §2.13 (the generated catalog index) must match the live
catalog — a stale index would send the coverage audit to wrong builders or
hide new entries. Regenerate with:  python tools/catalog_index.py"""

from __future__ import annotations

import os

from tools.catalog_index import BEGIN, END, SURVEY, render


def test_survey_catalog_index_in_sync():
    with open(SURVEY) as f:
        text = f.read()
    assert BEGIN in text and END in text, "SURVEY.md §2.13 missing"
    committed = text[text.index(BEGIN) : text.index(END) + len(END)]
    assert committed == render(), (
        "SURVEY.md §2.13 is stale — run: python tools/catalog_index.py"
    )
    assert os.path.exists(SURVEY)
