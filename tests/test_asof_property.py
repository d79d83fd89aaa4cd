"""Property-based differential: asof_join vs pandas merge_asof.

pandas ``merge_asof`` (all three directions — 'forward' and 'nearest'
added round 7) is the reference semantic the operator claims (SURVEY.md
§2.3); hypothesis drives randomized (key, ts)
shapes — clustered ties, empty sides, lone keys — far beyond what the
fixture differential exercises. Right-side (key, ts) pairs are unique by
construction: with duplicate right timestamps inside one key the carried
value is unspecified in BOTH engines (pandas takes input order, the window
form takes an arbitrary tie order), so that case is deliberately outside
the property.

Whole-second timestamps make the tolerance comparison exact in both
engines (the operator compares floor-epoch seconds; on whole seconds
truncation is the identity), so tolerance parity is checked too.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sql4pandas_spark.operators.joins import asof_join

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _ts(sec: int) -> datetime:
    return datetime.fromtimestamp(BASE.timestamp() + sec, tz=timezone.utc).replace(
        tzinfo=None
    )


left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 300)), min_size=0, max_size=25
)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 300), st.integers(0, 10**6)),
    min_size=0,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # unique (key, ts): see module docstring
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=left_rows,
    right=right_rows,
    tol=st.sampled_from([None, 60]),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, tol, direction):
    lpdf = pd.DataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left)],
        columns=["row_id", "k", "ts"],
    ).astype({"row_id": "int64", "k": "int64", "ts": "datetime64[ns]"})
    rpdf = pd.DataFrame(
        [(k, _ts(s), v) for (k, s, v) in right], columns=["k", "ts", "v"]
    ).astype({"k": "int64", "ts": "datetime64[ns]", "v": "int64"})

    # pandas reference (both directions, inclusive, optional tolerance)
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
    )
    want_map = {
        int(r.row_id): (None if pd.isna(r.v) else int(r.v))
        for r in want.itertuples()
    }

    ldf = spark.createDataFrame(lpdf, "row_id long, k long, ts timestamp")
    rdf = spark.createDataFrame(rpdf, "k long, ts timestamp, v long")
    got = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance_seconds=tol, direction=direction,
    )
    got_map = {
        int(r.row_id): (None if r.v is None else int(r.v)) for r in got.collect()
    }
    assert got_map == want_map


from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators.joins import salted_join  # noqa: E402

big_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.integers(0, 10**6)),
    min_size=0,
    max_size=30,
)
small_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 10**6)),
    min_size=0,
    max_size=10,
    unique_by=lambda r: r[0],
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(big=big_rows, small=small_rows, how=st.sampled_from(["inner", "left"]))
def test_salted_join_equals_plain_join(spark, big, small, how):
    """salted_join must be row-for-row identical to the plain join for every
    input shape — hot keys, null keys, empty sides — under every allowed
    join type. (Null big-side keys exercise the salt column too: xxhash64
    over a null column still yields a salt, and the null key then drops
    (inner) or carries NULLs (left) exactly like the plain join.)"""
    bdf = spark.createDataFrame(
        pd.DataFrame(big, columns=["k", "v"]).astype({"k": "Int64", "v": "int64"}),
        "k long, v long",
    )
    sdf = spark.createDataFrame(
        pd.DataFrame(small, columns=["k2", "w"]).astype({"k2": "int64", "w": "int64"}),
        "k2 long, w long",
    )
    plain = bdf.join(sdf, F.col("k") == F.col("k2"), how)
    salted = salted_join(bdf, sdf, "k", "k2", n_salts=4, how=how)
    key = lambda r: tuple(-1 if x is None else x for x in r)  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


from sql4pandas_spark.operators.joins import bucketed_range_join  # noqa: E402

ts_rows = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 7200)),  # (id, seconds)
    min_size=0,
    max_size=25,
    unique_by=lambda r: r[0],
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left=ts_rows, right=ts_rows, gap=st.sampled_from([60, 900, 3600]))
def test_bucketed_range_join_equals_theta_join(spark, left, right, gap):
    """The interval-bucketed hash formulation must return exactly the pairs
    of the naive theta join it replaces: right_ts in (left_ts, left_ts+gap].
    Randomized timestamps probe the bucket boundaries (rows landing exactly
    on a gap multiple, both sides empty, dense ties)."""
    ldf = spark.createDataFrame(
        pd.DataFrame(
            [(i, _ts(s)) for i, s in left], columns=["l_id", "lts"]
        ).astype({"l_id": "int64", "lts": "datetime64[ns]"}),
        "l_id long, lts timestamp",
    )
    rdf = spark.createDataFrame(
        pd.DataFrame(
            [(i, _ts(s)) for i, s in right], columns=["r_id", "rts"]
        ).astype({"r_id": "int64", "rts": "datetime64[ns]"}),
        "r_id long, rts timestamp",
    )
    got = {
        (r.l_id, r.r_id)
        for r in bucketed_range_join(ldf, rdf, "lts", "rts", gap)
        .select("l_id", "r_id")
        .collect()
    }
    want = {
        (i, j)
        for i, ls in left
        for j, rs in right
        if ls < rs <= ls + gap
    }
    assert got == want


from sql4pandas_spark.operators.joins import interval_overlap_join  # noqa: E402

iv_rows = st.lists(
    # (key, start_sec, duration_sec): durations beyond the bucket width W=60
    # exercise the multi-bucket fan-out; zero-length intervals included
    st.tuples(st.integers(0, 2), st.integers(0, 400), st.integers(0, 150)),
    min_size=0,
    max_size=18,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left=iv_rows, right=iv_rows)
def test_interval_overlap_join_equals_theta_join(spark, left, right):
    """Bucketed interval-overlap must equal the naive inequality join
    EXACTLY — same pairs, each exactly once (the first-shared-bucket rule
    replaces a distinct pass)."""
    ldf = spark.createDataFrame(
        [(i, _ts(s), _ts(s + d)) for i, (k, s, d) in enumerate(left)],
        "id_a long, s_a timestamp, e_a timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, _ts(s), _ts(s + d)) for i, (k, s, d) in enumerate(right)],
        "id_b long, s_b timestamp, e_b timestamp",
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in interval_overlap_join(
            ldf, rdf, "s_a", "e_a", "s_b", "e_b", max_interval_seconds=60
        ).collect()
    )
    want = sorted(
        (la, rb)
        for la, (_, ls, ld) in enumerate(left)
        for rb, (_, rs, rd) in enumerate(right)
        if ls <= rs + rd and rs <= ls + ld
    )
    assert got == want


def test_interval_overlap_join_plans_hash_join(spark):
    ldf = spark.createDataFrame(
        [(1, _ts(0), _ts(30))], "id_a long, s_a timestamp, e_a timestamp"
    )
    plan = (
        interval_overlap_join(ldf, ldf.toDF("id_b", "s_b", "e_b"),
                              "s_a", "e_a", "s_b", "e_b", 60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
