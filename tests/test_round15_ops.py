"""Round-15 optimization-phase focused tests: the spread_for_compute
parallelism guard, the connected_components convergence-check hardening
(identity-sum round-1 baseline + loud decimal-overflow guard), and the
gopher_rules extra_cols collision validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------- spread_for_compute: input-parallelism guard


def test_spread_skips_already_parallel_input(spark):
    """An input that already plans at >= the session shuffle width must
    pass through UNTOUCHED — at 100 TB a parquet scan with natural
    file-split parallelism must not pay a full (id, text) exchange for
    nothing (the guard the round-14 verdict asked for)."""
    from sql4pandas_spark.operators.spread import (
        compute_width,
        spread_for_compute,
    )

    width = compute_width(spark)
    wide = spark.range(0, 10_000, 1, width + 4).toDF("doc_id")
    assert wide.rdd.getNumPartitions() == width + 4
    out = spread_for_compute(wide)
    assert out is wide  # identical object: no exchange was added


def test_spread_still_spreads_serial_input(spark):
    """A serial (1-partition) input — the single-row-group-scan case the
    operator exists for — still spreads to the session width."""
    from sql4pandas_spark.operators.spread import (
        compute_width,
        spread_for_compute,
    )

    serial = spark.range(0, 1000, 1, 1).toDF("doc_id")
    out = spread_for_compute(serial)
    assert out.rdd.getNumPartitions() == compute_width(spark)
    # round-robin repartition: same rows, exactly once
    assert out.count() == 1000
    assert out.agg(F.sum("doc_id")).collect()[0][0] == 999 * 1000 // 2


# ---------------------- connected_components convergence check


def test_cc_self_loop_only_graph_converges_in_one_round(spark):
    """A pair graph whose first propagation round is already a fixpoint
    (every pair is a self-loop) must converge with max_iter=1 — the
    sentinel start previously forced a spurious extra round and a
    RuntimeError under a tight max_iter (ADVICE r14)."""
    from sql4pandas_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 1), (2, 2), (7, 7)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, max_iter=1).collect()
    }
    assert out == {1: 1, 2: 2, 7: 7}


def test_cc_empty_pair_graph_returns_empty(spark):
    """The empty pair graph converges immediately (None sums come from
    emptiness, not overflow — the guard must not fire)."""
    from sql4pandas_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs, max_iter=1).count() == 0


def test_cc_chain_still_merges_to_min_label(spark):
    """Regression pin for the reworked numeric check: a 4-chain merges to
    one cluster labeled by its smallest id, in diameter rounds."""
    from sql4pandas_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


# ---------------------- gopher_rules extra_cols validation


def test_gopher_extra_cols_collision_raises(spark):
    """extra_cols overlapping the generated output names must raise
    instead of silently producing duplicate/ambiguous columns."""
    from sql4pandas_spark.operators.text import gopher_rules

    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    for bad in ("n_words", "keep", "r_stopwords", "doc_id"):
        with pytest.raises(ValueError, match="extra_cols"):
            gopher_rules(df, extra_cols=(bad,))
