"""Text-analysis invariants over the documents fixture — the fixture carries
ground-truth `lang` labels, so lang-id is measured, not assumed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql4pandas_spark.operators import text
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_lang_id_recovers_planted_languages(spark):
    """Synthetic docs dominated by each language's stopwords must classify
    correctly. (The FIXTURE's `lang` labels are independent of its text — all
    docs share one English-ish vocabulary, measured accuracy 0.37 — so label
    accuracy is not a valid oracle there; planted text is.)"""
    rows = []
    for i, (lang, words) in enumerate(sorted(text.LANG_STOPWORDS.items())):
        body = " ".join(words * 3) + " data table query"
        rows.append((i, body, lang))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    scored = text.lang_id(df)
    wrong = scored.filter(F.col("lang") != F.col("lang_pred")).collect()
    assert not wrong, f"misclassified planted docs: {wrong}"


def test_lang_id_deterministic_on_ties(spark):
    """A document with zero stopword hits must resolve to the SAME language
    every run (lexicographic tiebreak), or the driver's determinism check
    flaps."""
    df = spark.createDataFrame(
        [(1, "zzz qqq xxx"), (2, "zzz qqq xxx")], "doc_id long, text string"
    )
    out = {r.doc_id: r.lang_pred for r in
           text.lang_id(df.withColumn("lang", F.lit("??"))).collect()}
    assert out[1] == out[2] == "de", (
        "zero-hit tiebreak must pick the lexicographically first language"
    )


def test_quality_features_bounds(docs):
    q = text.quality_features(docs)
    bad = q.filter(
        (F.col("punct_ratio") < 0) | (F.col("punct_ratio") > 1)
        | (F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)
        | (F.col("n_tokens") <= 0) | (F.col("avg_token_len") <= 0)
    ).count()
    assert bad == 0


def test_winnow_fingerprint_blocking_property(docs):
    """Identical texts share a fingerprint (it's a pure function of content);
    the fingerprint is stable across runs."""
    fp1 = {r.doc_id: r.fingerprint for r in text.winnow_fingerprint(docs).collect()}
    fp2 = {r.doc_id: r.fingerprint for r in text.winnow_fingerprint(docs).collect()}
    assert fp1 == fp2
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    by_text: dict[str, set] = {}
    for did, t in texts.items():
        by_text.setdefault(t, set()).add(fp1[did])
    dup_groups = [fps for fps in by_text.values() if len(fps) > 1]
    assert not dup_groups, "same text must yield the same fingerprint"


def test_bpe_token_count_matches_python_regex(docs):
    import re

    pat = re.compile(text.BPE_TOKEN_RE)
    rows = docs.select("doc_id", "text").limit(50).collect()
    got = {
        r.doc_id: r.n
        for r in docs.limit(50)
        .select("doc_id", text.bpe_token_count("text").alias("n"))
        .collect()
    }
    for r in rows:
        assert got[r.doc_id] == len(pat.findall(r.text)), r.doc_id


def test_repetition_stats_edges_and_values(spark):
    import pandas as pd

    from sql4pandas_spark.operators.text import repetition_stats

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a a a a",          # one distinct word, one distinct bigram
                "one",               # single token: no bigrams -> NULL frac
                "x y x y z",         # 'x y' appears twice of 4 bigrams
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for r in repetition_stats(spark.createDataFrame(pdf)).collect()
    }
    assert out[1]["dup_word_frac"] == 0.75 and out[1]["top_bigram_frac"] == 1.0
    assert out[2]["top_bigram_frac"] is None and out[2]["dup_word_frac"] == 0.0
    assert out[3]["n_tokens"] == 5 and out[3]["top_bigram_frac"] == 0.5


def test_canonical_url_tracking_params_and_normalization(spark):
    from sql4pandas_spark.operators.text import canonical_url

    cases = [
        # valueless ?gclid must canonicalize the same as ?gclid=x (the
        # param NAME decides, not a literal `gclid=` prefix)
        ("https://Ex.COM/a/?gclid", "https://ex.com/a"),
        ("https://ex.com/a/?gclid=123", "https://ex.com/a"),
        ("https://ex.com/a?fbclid&b=1", "https://ex.com/a?b=1"),
        # but a param merely STARTING with the name is a different param
        ("https://ex.com/a?gclidx=1", "https://ex.com/a?gclidx=1"),
        ("http://ex.com:80/p?utm_source=x&z=1&a=2", "http://ex.com/p?a=2&z=1"),
        ("https://ex.com:443/p#frag", "https://ex.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]
