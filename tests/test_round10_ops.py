"""Round-10 fixes: join_fanout multi-column keys, cache-leak removal
(ReusedExchange instead of persist), top_movers calendar adjacency, and
value_histogram NaN handling."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F


# ------------------------------------- join_fanout multi-column keys


def test_join_fanout_multi_key_does_not_collapse_tuples(spark):
    """('ab','c') and ('a','bc') are DIFFERENT composite keys: a
    separator-less concat merged them within a side and fabricated
    matches across sides (the round-9 ADVICE medium finding)."""
    from sql4pandas_spark.operators.profile import join_fanout_estimate

    left = spark.createDataFrame(
        [("ab", "c"), ("ab", "c"), ("a", "bc")], ["k1", "k2"]
    )
    right = spark.createDataFrame(
        [("ab", "c"), ("x", "y")], ["r1", "r2"]
    )
    est = join_fanout_estimate(left, right, ["k1", "k2"], ["r1", "r2"])
    rows = est.collect()
    actual = left.join(
        right, (left.k1 == right.r1) & (left.k2 == right.r2)
    ).count()
    # only ('ab','c') matches: 2 left x 1 right = 2 rows out; the old
    # concat collapsed ('a','bc') into the same key and reported 3x1
    assert actual == 2
    assert rows[0]["total_rows_out"] == 2
    assert rows[0]["n_matching_keys"] == 1
    assert (rows[0]["n_left"], rows[0]["n_right"]) == (2, 1)
    assert rows[0]["key"] == "ab\x1fc"


def test_join_fanout_single_key_report_unchanged(spark):
    from sql4pandas_spark.operators.profile import join_fanout_estimate

    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(1,), (1,), (1,), (2,), (9,)], ["r"])
    rows = join_fanout_estimate(left, right, ["k"], ["r"], top_k=5).collect()
    assert rows[0]["total_rows_out"] == 7
    assert rows[0]["key"] == "1"  # no separator artifacts on single keys


# --------------------------- persist removal: shuffle reuse, no cache


@pytest.mark.parametrize(
    "build",
    [
        pytest.param("key_skew", id="key_skew_profile"),
        pytest.param("fanout", id="join_fanout_estimate"),
        pytest.param("mad", id="mad_anomalies"),
        pytest.param("chisq", id="categorical_association"),
    ],
)
def test_profile_operators_reuse_exchange_and_pin_no_cache(spark, build):
    """The multi-consumer counts frames must be served by AQE
    ReusedExchange (single scan) with ZERO persisted storage left
    behind — a .persist() on a lazily-returned frame has no unpersist
    point and accumulated cached frames across calls (round-9 ADVICE)."""
    from sql4pandas_spark.operators.profile import (
        categorical_association,
        join_fanout_estimate,
        key_skew_profile,
        mad_anomalies,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    if build == "key_skew":
        out = key_skew_profile(events, "event_type", top_k=5)
    elif build == "fanout":
        out = join_fanout_estimate(
            docs, docs.selectExpr("lang AS l2"), ["lang"], ["l2"], top_k=5
        )
    elif build == "mad":
        out = mad_anomalies(events, "ts", "event_type", bucket="day")
    else:
        out = categorical_association(docs, "lang", "source")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    if build == "chisq":
        # column-pruned subplans differ -> no exchange reuse possible;
        # a GC-cleanable localCheckpoint replaces the leaking persist
        assert "Scan ExistingRDD" in final
    else:
        assert "ReusedExchange" in final, f"no exchange reuse in {build}"
        jsc = spark.sparkContext._jsc.sc()
        assert jsc.getPersistentRDDs().isEmpty(), (
            f"{build} left persisted RDDs behind"
        )
    # none of them may register in the CacheManager — THAT is the leak
    # (CacheManager holds plans until an explicit unpersist; RDD-level
    # localCheckpoint blocks are ContextCleaner-released on GC)
    assert "InMemoryTableScan" not in final
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        f"{build} left a CacheManager entry behind"
    )


def test_mad_anomalies_values_survive_persist_removal(spark):
    """Semantics check: same flags as a hand-computed MAD on a tiny
    series (one spike among steady hourly counts)."""
    from sql4pandas_spark.operators.profile import mad_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(8):
        n = 50 if h == 3 else 4 + (h % 2)
        rows += [("g", base + dt.timedelta(hours=h, seconds=s)) for s in range(n)]
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = mad_anomalies(df, "ts", "event_type", bucket="hour", k=3).collect()
    assert [(r["bucket_ts"].hour, r["n_events"]) for r in out] == [(3, 50)]


# ------------------------------------- top_movers calendar adjacency


def test_top_movers_nulls_prev_after_silent_gap(spark):
    """A group returning after a silent week must NOT report growth
    against the stale last-active bucket (round-9 ADVICE): weeks 1,2
    are adjacent (row emitted), week 4 follows silent week 3 (no row)."""
    from sql4pandas_spark.operators.behavior import top_movers

    w1 = dt.datetime(2024, 1, 1)  # a Monday: date_trunc-week-stable
    rows = []
    for week, n in [(0, 4), (1, 6), (3, 12)]:
        ts = w1 + dt.timedelta(weeks=week)
        rows += [("a", ts + dt.timedelta(minutes=i)) for i in range(n)]
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = top_movers(df, "event_type", bucket="week").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["bucket_ts"], r["n_events"], r["prev_events"]) == (
        w1 + dt.timedelta(weeks=1),
        6,
        4,
    )
    assert r["growth_ppm"] == (6 - 4) * 1_000_000 // 4


# ------------------------------------- value_histogram NaN handling


def test_value_histogram_drops_nan_keeps_infinity_clamped(spark):
    from sql4pandas_spark.operators.sketches import value_histogram

    df = spark.createDataFrame(
        [(0.5,), (float("nan"),), (float("inf",),), (float("-inf"),), (9.5,)],
        ["x"],
    )
    hist = {r["bin"]: r["n"] for r in value_histogram(df, "x", 0.0, 10.0, 10).collect()}
    # NaN dropped; +inf clamps to top bin, -inf to bottom bin
    assert hist == {0: 2, 9: 2}
