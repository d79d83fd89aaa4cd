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
