"""Property differentials for the round-9 continuation operators: each
Spark operator is replayed by an independent pure-Python reference over
hypothesis-generated inputs (derandomized — a pass is reproducible). These
cover the operators whose catalog oracles exercise one fixture shape:
sessionize (random gaps/ties), winsorize (random groups incl. tiny ones),
percentile rank (ties everywhere), rolling active users (random sparse
activity), and the quantile-histogram read-out (random counts)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = dt.datetime(2025, 1, 1)


@st.composite
def event_streams(draw):
    n = draw(st.integers(1, 30))
    return [
        (
            draw(st.integers(1, 3)),
            _T0 + dt.timedelta(seconds=draw(st.integers(0, 20000))),
        )
        for _ in range(n)
    ]


def _py_sessionize(rows, gap=1800):
    by_user: dict = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    out = []
    for u, times in by_user.items():
        times.sort()
        sid, start, prev, count = 0, None, None, 0
        for ts in times:
            if prev is None or (ts - prev).total_seconds() > gap:
                if sid:
                    out.append((u, sid, start, prev, count))
                sid += 1
                start, count = ts, 0
            count += 1
            prev = ts
        out.append((u, sid, start, prev, count))
    return sorted(out)


@given(event_streams())
@settings(**_SETTINGS)
def test_sessionize_matches_python(spark, rows):
    from sql4pandas_spark.operators.behavior import sessionize

    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = sorted(
        (
            r["user_id"],
            r["session_idx"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
        )
        for r in sessionize(df).collect()
    )
    assert got == _py_sessionize(rows)


@st.composite
def grouped_values(draw):
    n = draw(st.integers(1, 40))
    return [
        (draw(st.sampled_from(["a", "b"])), draw(st.integers(0, 50)))
        for _ in range(n)
    ]


@given(grouped_values())
@settings(**_SETTINGS)
def test_winsorize_matches_python(spark, rows):
    from sql4pandas_spark.operators.profile import winsorize_by_group

    df = spark.createDataFrame(rows, ["g", "v"])
    got = {}
    for r in winsorize_by_group(df, "v", "g", 5, 95).collect():
        got.setdefault(r["g"], set()).add(
            (r["v"], r["lo_val"], r["hi_val"], r["v_winsorized"])
        )
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        lo = vals[(5 * n + 99) // 100 - 1]
        hi = vals[(95 * n + 99) // 100 - 1]
        expected = {(v, lo, hi, min(max(v, lo), hi)) for v in vals}
        assert got[g] == expected, (g, got[g], expected)


@given(grouped_values())
@settings(**_SETTINGS)
def test_pct_rank_matches_python(spark, rows):
    from sql4pandas_spark.operators.text import percentile_rank_by_group

    df = spark.createDataFrame(rows, ["g", "v"])
    got = sorted(
        (r["g"], r["v"], r["pct_rank_ppm"])
        for r in percentile_rank_by_group(df, "v", "g").collect()
    )
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    expected = []
    for g, vals in by_g.items():
        n = len(vals)
        for v in vals:
            le = sum(1 for x in vals if x <= v)
            expected.append((g, v, le * 1_000_000 // n))
    assert got == sorted(expected)


@st.composite
def activity(draw):
    n = draw(st.integers(1, 25))
    return [
        (draw(st.integers(1, 4)), draw(st.integers(0, 12)))
        for _ in range(n)
    ]


@given(activity())
@settings(**_SETTINGS)
def test_rolling_active_users_matches_python(spark, pairs):
    from sql4pandas_spark.operators.behavior import rolling_active_users

    rows = [(u, _T0 + dt.timedelta(days=d)) for u, d in pairs]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = sorted(
        (r["day"].day, r["dau"], r["wau"])
        for r in rolling_active_users(df).collect()
    )
    days = sorted({d for _, d in pairs})
    expected = []
    for d in range(days[0], days[-1] + 1):
        dau = len({u for u, dd in pairs if dd == d})
        wau = len({u for u, dd in pairs if d - 6 <= dd <= d})
        expected.append((d + 1, dau, wau))  # day-of-month of _T0 + d
    assert got == expected


@st.composite
def hist_counts(draw):
    n_bins = draw(st.integers(2, 8))
    occupied = draw(
        st.lists(
            st.tuples(
                st.integers(0, n_bins - 1), st.integers(1, 20)
            ),
            min_size=1,
            max_size=n_bins,
            unique_by=lambda t: t[0],
        )
    )
    pcts = draw(
        st.lists(st.integers(1, 99), min_size=1, max_size=3, unique=True)
    )
    return n_bins, occupied, pcts


@given(hist_counts())
@settings(**_SETTINGS)
def test_quantile_readout_matches_python(spark, case):
    from sql4pandas_spark.operators.sketches import quantiles_from_histogram

    n_bins, occupied, pcts = case
    hist = spark.createDataFrame(occupied, ["bin", "n"])
    got = {
        r["pct"]: (r["n_total"], r["bin"])
        for r in quantiles_from_histogram(
            hist, pcts, lo=0.0, hi=float(n_bins), n_bins=n_bins
        ).collect()
    }
    total = sum(n for _, n in occupied)
    for p in pcts:
        rank = (p * total + 99) // 100
        cum = 0
        ans = None
        for b, n in sorted(occupied):
            cum += n
            if cum >= rank:
                ans = b
                break
        assert got[p] == (total, ans), (p, got[p], (total, ans))
