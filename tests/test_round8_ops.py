"""Round-8 operator unit tests: substring/passage-level exact dedup
(detection + scrub), keyed MERGE/upsert, quality-classifier scoring.

Catalog entries carry the DuckDB value oracles; these tests pin the
operator-level semantics the entries can't isolate: span maximality,
the canonical-site scrub policy, sub-threshold negatives, and edge
inputs (short docs, periodic text, whole-doc duplicates).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BOILER12 = " ".join(f"bp{i:02d}" for i in range(12))
PREFIX10 = " ".join(f"bp{i:02d}" for i in range(10))


def _passage_docs(spark):
    rows = [
        (1, "alpha beta gamma " + BOILER12 + " delta"),  # full copy at 4..15
        (2, BOILER12 + " epsilon zeta eta theta"),  # full copy at 1..12
        (3, "iota kappa " + PREFIX10),  # 10-token prefix at 3..12
        (4, "unique words only here nothing shared at all among docs"),
        (5, "short doc"),  # below L entirely
        (6, "rep rep rep rep rep rep rep rep rep rep"),  # periodic, self-dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_passage_spans_detection(spark):
    from sql4pandas_spark.operators.dedup import duplicate_passage_spans

    spans = {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens)
        for r in duplicate_passage_spans(_passage_docs(spark), min_tokens=8).collect()
    }
    assert spans == {
        (1, 4, 15, 12),  # full boilerplate inside surrounding context
        (2, 1, 12, 12),  # full boilerplate at doc start
        (3, 3, 12, 10),  # only the shared 10-token prefix, not the tail
        (6, 1, 10, 10),  # periodic text: every 8-gram equals every other
    }
    # docs 4 (unique) and 5 (< L tokens) must yield nothing — and doc 3's
    # span proves partial (prefix) sharing reports the SHARED extent only


def test_scrub_keeps_canonical_occurrence_only(spark):
    from sql4pandas_spark.operators.dedup import scrub_duplicate_passages

    out = {
        r.doc_id: r
        for r in scrub_duplicate_passages(_passage_docs(spark), min_tokens=8).collect()
    }
    # doc 1 is the lexicographically-first holder -> keeps its copy intact
    assert out[1].text.split() == ("alpha beta gamma " + BOILER12 + " delta").split()
    # doc 2 loses the full passage, keeps its own tail
    assert out[2].text == "epsilon zeta eta theta"
    # doc 3 loses exactly the shared prefix
    assert out[3].text == "iota kappa"
    # untouched docs round-trip
    assert out[4].n_tokens_before == out[4].n_tokens_after == 10
    assert out[5].text == "short doc"
    # periodic self-dup: canonical site (pos 1) covers 1..8; sites 2,3 are
    # redundant and cover 2..10 -> positions 9,10 removed
    assert out[6].text == " ".join(["rep"] * 8)


def test_scrub_whole_doc_duplicate_scrubs_to_empty(spark):
    from sql4pandas_spark.operators.dedup import scrub_duplicate_passages

    text = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in scrub_duplicate_passages(df, min_tokens=8).collect()}
    assert out[1].text.split() == text.split()
    assert out[2].text == "" and out[2].n_tokens_after == 0


def test_spans_require_two_sites_not_two_docs(spark):
    """An intra-doc repeat is a duplicated passage too (Lee et al. count
    occurrences corpus-wide, not cross-doc only)."""
    from sql4pandas_spark.operators.dedup import duplicate_passage_spans

    seg = " ".join(f"s{i}" for i in range(9))
    df = spark.createDataFrame(
        [(1, seg + " filler middle words " + seg)], "doc_id long, text string"
    )
    got = {
        (r.span_start, r.span_end)
        for r in duplicate_passage_spans(df, min_tokens=9).collect()
    }
    assert got == {(1, 9), (13, 21)}


def test_spans_empty_when_below_min_tokens(spark):
    from sql4pandas_spark.operators.dedup import duplicate_passage_spans

    short = " ".join(f"c{i}" for i in range(7))  # shared 7 < L=8
    df = spark.createDataFrame(
        [(1, short + " xone xtwo"), (2, short + " ythree yfour")],
        "doc_id long, text string",
    )
    assert duplicate_passage_spans(df, min_tokens=8).count() == 0
