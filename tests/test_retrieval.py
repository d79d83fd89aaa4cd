"""BM25 retrieval scoring: hand-computed ground truth on a tiny corpus,
engine-parity of the rounding contract, edge inputs, and the scale-shape
plan probes (TakeOrdered top-k, zero Python in the row path)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql4pandas_spark.operators.retrieval import bm25_topk


def _expected(tf: float, dl: int, n: int, avgdl: float, df: int) -> float:
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    norm = 1.2 * (0.25 + 0.75 * dl / avgdl)
    return idf * tf * 2.2 / (tf + norm)


def test_bm25_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple"),
            (4, "cherry date fig"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.bm25
        for r in bm25_topk(docs, ["apple"], k=10).collect()
    }
    # N=4, avgdl=2.25, df(apple)=2; docs 2 and 4 score 0 -> excluded
    assert set(got) == {1, 3}
    assert got[1] == round(_expected(2, 3, 4, 2.25, 2), 4)
    assert got[3] == round(_expected(1, 1, 4, 2.25, 2), 4)
    # length normalization outweighs the extra occurrence here: the short
    # single-hit doc outranks the longer double-hit one
    assert got[3] > got[1]


def test_bm25_multi_term_sums_and_ranks(spark):
    docs = spark.createDataFrame(
        [
            (1, "x y x y"),
            (2, "x z"),
            (3, "z z z"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["x", "y"], k=10).collect()
    # doc 1 matches both terms, doc 2 one, doc 3 none
    assert [r.doc_id for r in rows] == [1, 2]
    n, avgdl = 3, 3.0
    want1 = _expected(2, 4, n, avgdl, 2) + _expected(2, 4, n, avgdl, 1)
    assert rows[0].bm25 == round(want1, 4)


def test_bm25_edge_inputs(spark):
    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    # NULL and empty text never surface; absent term scores no rows
    assert [r.doc_id for r in bm25_topk(docs, ["apple"], k=5).collect()] == [1]
    assert bm25_topk(docs, ["zzz"], k=5).count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, [])


def test_bm25_plan_shape(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string"), F.lit(" common")).alias(
            "text"
        ),
    )
    plan = (
        bm25_topk(docs, ["common", "w3"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-k must not be a global sort, scoring must stay JVM-side, and the
    # only join is the 1-row broadcast stats join (never a cartesian)
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# reciprocal-rank fusion (round 9)
# ---------------------------------------------------------------------------


def _micro(rank: int, k0: int = 60) -> int:
    return int(1_000_000_000 // (k0 + rank))


def test_rrf_fuse_hand_computed(spark):
    """Two 3-row rankings with one shared id: the both-sources doc must
    fuse to the exact integer micro-score sum and outrank every
    single-source doc here."""
    from sql4pandas_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 3.2), (20, 2.1), (30, 0.5)], "doc_id long, bm25 double"
    )
    sem = spark.createDataFrame(
        [(20, 0.99), (40, 0.7), (50, 0.6)], "doc_id long, sim double"
    )
    got = [
        (r.doc_id, r.rrf_micro, r.n_sources)
        for r in rrf_fuse([lex, sem], k=10).collect()
    ]
    expected = sorted(
        [
            (10, _micro(1), 1),
            (20, _micro(2) + _micro(1), 2),
            (30, _micro(3), 1),
            (40, _micro(2), 1),
            (50, _micro(3), 1),
        ],
        key=lambda t: (-t[1], -t[2], t[0]),
    )
    assert got == expected
    assert got[0][0] == 20  # both-sources doc wins


def test_rrf_fuse_rank_ties_break_on_id(spark):
    """Equal scores inside one ranking -> rank order falls to id asc, the
    same deterministic cut the repo's top-k frames already guarantee."""
    from sql4pandas_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame(
        [(7, 1.0), (3, 1.0), (5, 1.0)], "doc_id long, s double"
    )
    got = [(r.doc_id, r.rrf_micro) for r in rrf_fuse([r1], k=3).collect()]
    assert got == [(3, _micro(1)), (5, _micro(2)), (7, _micro(3))]


def test_rrf_fuse_k_cut_and_validation(spark):
    from sql4pandas_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(6)], "doc_id long, s double"
    )
    assert rrf_fuse([r1], k=2).count() == 2
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    bad = r1.withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="must be"):
        rrf_fuse([bad])


def test_rrf_fuse_three_sources_order_independent(spark):
    """3+ sources is where float RRF would lose associativity — the integer
    micro-score sum must be identical for every source order."""
    from sql4pandas_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 3.0), (2, 2.0)], "doc_id long, s double")
    b = spark.createDataFrame([(2, 9.0), (3, 8.0)], "doc_id long, s double")
    c = spark.createDataFrame([(1, 0.4), (2, 0.3)], "doc_id long, s double")
    fwd = sorted(map(tuple, rrf_fuse([a, b, c], k=5).collect()))
    rev = sorted(map(tuple, rrf_fuse([c, b, a], k=5).collect()))
    assert fwd == rev
    # doc 2: rank 2 in a (3.0 > 2.0), rank 1 in b, rank 2 in c
    assert dict((d, m) for d, m, _ in fwd)[2] == _micro(1) + _micro(2) * 2
