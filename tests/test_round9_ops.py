"""Directed + property tests for the round-9 continuation operators added
after the verdict items closed: incremental aggregate maintenance
(operators/maintenance.partial_agg_state + merge_agg_states). The core
invariant is refresh-equivalence: a state maintained batch-by-batch must be
indistinguishable from a from-scratch rebuild over the union of all
batches, for ANY split of the rows into batches (including empty batches
and key-disjoint batches)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from sql4pandas_spark.operators.maintenance import (
    merge_agg_states,
    partial_agg_state,
)

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)

_MEASURES = {
    "n": ("count", "v"),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}
_MERGES = {"n": "count", "s": "sum", "lo": "min", "hi": "max"}


def _state_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _maintain(spark, batches):
    state = partial_agg_state(
        spark.createDataFrame(batches[0], _SCHEMA), ["k"], _MEASURES
    )
    for rows in batches[1:]:
        delta = partial_agg_state(
            spark.createDataFrame(rows, _SCHEMA), ["k"], _MEASURES
        )
        state = merge_agg_states(state, delta, ["k"], _MERGES)
    return state


@st.composite
def batch_splits(draw):
    n = draw(st.integers(1, 24))
    rows = [
        (draw(st.integers(0, 5)), draw(st.integers(-1000, 1000)))
        for _ in range(n)
    ]
    n_batches = draw(st.integers(1, 4))
    assign = [draw(st.integers(0, n_batches - 1)) for _ in rows]
    batches = [
        [r for r, a in zip(rows, assign) if a == b] for b in range(n_batches)
    ]
    # first batch must be non-empty (createDataFrame([], schema) is fine,
    # but keep the base state meaningful); empty LATER batches stay — an
    # idle refresh interval must be a no-op, not a corruption
    if not batches[0]:
        batches[0] = [rows[0]]
    return rows, batches


@given(batch_splits())
@settings(**_SETTINGS)
def test_maintained_state_equals_full_rebuild(spark, case):
    """Refresh-equivalence under arbitrary batch splits, incl. empty
    deltas and keys present in only some batches."""
    _, batches = case
    maintained = _maintain(spark, batches)
    rebuilt = partial_agg_state(
        spark.createDataFrame([r for b in batches for r in b], _SCHEMA),
        ["k"],
        _MEASURES,
    )
    assert _state_rows(maintained) == _state_rows(rebuilt)


def test_merge_adds_zero_exchanges_over_copartitioned_states(spark):
    """When both state inputs are already hash-partitioned on the key
    (they always are: partial_agg_state's own groupBy leaves them so, and
    bucketed state storage preserves it on disk), the merge groupBy must
    add NO new exchange — Catalyst's ENSURE_REQUIREMENTS sees the union's
    children co-partitioned on k and plans partial+final HashAggregate
    directly. 2 exchanges total = one per raw-batch partial agg, zero for
    the merge; 3 would mean every refresh re-shuffles the whole state."""
    a = partial_agg_state(
        spark.createDataFrame([(1, 10), (2, 20)], _SCHEMA), ["k"], _MEASURES
    )
    b = partial_agg_state(
        spark.createDataFrame([(1, 5), (3, 7)], _SCHEMA), ["k"], _MEASURES
    )
    merged = merge_agg_states(a, b, ["k"], _MERGES)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan
    assert _state_rows(merged) == [(1, 2, 15, 5, 10), (2, 1, 20, 20, 20), (3, 1, 7, 7, 7)]


def test_avg_derivation_beats_average_of_averages(spark):
    """The reason avg is NOT a state column: two batches with unequal
    sizes make mean-of-means wrong; deriving from (count, sum) after the
    merge is exact."""
    b1 = [(1, 10), (1, 20), (1, 30)]  # avg 20
    b2 = [(1, 100)]  # avg 100; naive mean-of-means = 60
    state = _maintain(spark, [b1, b2])
    row = state.collect()[0]
    assert row["s"] / row["n"] == 40.0
