"""Property differentials for the round-6 sampling/retrieval operators:
pure-Python references recompute BM25 and the hash-ordered quota sample on
randomized corpora, and the Spark results must match exactly — membership,
ordering, and (for BM25) the 4dp-quantized scores.

Derandomized like the other property files so a pass is reproducible.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sql4pandas_spark.operators.retrieval import bm25_topk
from sql4pandas_spark.operators.sampling import quota_sample

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon"]


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _round4(x: float) -> float:
    # Spark round() is HALF_UP on doubles; Python round() is banker's
    return math.floor(x * 10000.0 + 0.5) / 10000.0


@st.composite
def corpora(draw):
    n = draw(st.integers(3, 20))
    docs = [
        (i, " ".join(draw(st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8))))
        for i in range(n)
    ]
    terms = draw(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=3, unique=True)
    )
    return docs, terms


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs if t is not None}
    toks = {i: [w for w in ws if w] for i, ws in toks.items()}
    n = len(docs)
    lens = [len(ws) for ws in toks.values()]
    avgdl = sum(lens) / len(lens)
    if avgdl == 0:  # token-free corpus: BM25 undefined, nothing scores
        return []
    out = []
    for i, ws in toks.items():
        norm = k1 * (1 - b + b * len(ws) / avgdl)
        score = 0.0
        for t in terms:
            df = sum(1 for w2 in toks.values() if t in w2)
            tf = float(ws.count(t))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score = score + idf * tf * (k1 + 1.0) / (tf + norm)
        s4 = _round4(score)
        if s4 > 0:
            out.append((i, s4))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out


@given(corpora())
@settings(**_SETTINGS)
def test_bm25_matches_python_reference(spark, case):
    docs, terms = case
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r.doc_id, r.bm25) for r in bm25_topk(df, terms, k=10).collect()]
    assert got == _bm25_reference(docs, terms)[:10]


@given(
    st.lists(st.integers(0, 3), min_size=5, max_size=60),
    st.integers(1, 8),
    st.sampled_from([1.5, 2.0, 4.0]),
)
@settings(**_SETTINGS)
def test_quota_sample_matches_hash_rank_reference(spark, strata, quota, safety):
    rows = [(i, f"s{s}") for i, s in enumerate(strata)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    kept = quota_sample(df, "stratum", quota=quota, safety=safety, verify=True)
    got = sorted((r.doc_id, r.stratum) for r in kept.collect())

    by_stratum: dict[str, list[int]] = {}
    for i, s in rows:
        by_stratum.setdefault(s, []).append(i)
    want = sorted(
        (i, s)
        for s, ids in by_stratum.items()
        for i in sorted(ids, key=lambda x: (_hash60(str(x)), x))[:quota]
    )
    assert got == want
