"""Cross-batch semantics of the event-time-timeout sessionizer.

The catalog entry drains the fixture in one data batch (+ the final flush
batch); this test drives THREE time-split micro-batches so every delivery
path fires, with hand-computed expectations (validated interactively,
round 6):

- u1's first session (00:00–00:05, 2 events) ends long before batch 2's
  data — the event-time TIMEOUT closes it once the watermark passes.
- u2's only session times out the same way (no later data for u2 at all —
  the pure-timeout path a data-closed design would miss).
- u3's 01:00 session is DATA-closed by u3's own 02:01 event (gap > 10 min)
  in batch 3.
- u1's 02:00 and u3's 02:01 sessions stay OPEN: the final watermark
  (02:01 − 1 min = 02:00) has not passed their close times (02:10/02:11),
  so even the final flush batch leaves them in state.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sql4pandas_spark.streaming.stateful import sessionize_stateful
from sql4pandas_spark.streaming.windows import run_available_now

BATCHES = [
    [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:05:00"), (2, "2024-01-01 00:02:00")],
    [(3, "2024-01-01 01:00:00")],  # advances the watermark past u1/u2 timeouts
    [(1, "2024-01-01 02:00:00"), (3, "2024-01-01 02:01:00")],
]


@pytest.fixture()
def time_split_stream_dir(spark, tmp_path):
    src = tmp_path / "src"
    flat = tmp_path / "flat"
    os.makedirs(flat)
    n = 0
    for i, rows in enumerate(BATCHES):
        d = str(src / f"f{i}")
        (
            spark.createDataFrame(rows, "user_id long, ts_s string")
            .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
            .coalesce(1)
            .write.parquet(d)
        )
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(d, f), str(flat / f"{n:02d}.parquet"))
                n += 1
    assert n == 3
    return str(flat)


def test_timeout_and_data_closed_paths(spark, time_split_stream_dir):
    events = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(time_split_stream_dir)
        .withWatermark("ts", "1 minute")
    )
    out = run_available_now(
        sessionize_stateful(events, gap_minutes=10), mode="append"
    )
    got = sorted(
        (r.user_id, str(r.s_start), str(r.s_end), r.n) for r in out.collect()
    )
    gap = pd.Timedelta(minutes=10)

    def sess(uid, start, end, n):
        return (
            uid,
            str(pd.Timestamp(start)),
            str(pd.Timestamp(end) + gap),
            n,
        )

    assert got == sorted(
        [
            sess(1, "2024-01-01 00:00:00", "2024-01-01 00:05:00", 2),  # timeout
            sess(2, "2024-01-01 00:02:00", "2024-01-01 00:02:00", 1),  # timeout
            sess(3, "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1),  # data-closed
        ]
    ), got
    # u1@02:00 and u3@02:01 must NOT appear (still open at final watermark)
    assert all(not s[1].startswith("2024-01-01 02:") for s in got)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def event_sets(draw):
    n_users = draw(st.integers(1, 3))
    rows = []
    for uid in range(1, n_users + 1):
        n_ev = draw(st.integers(1, 8))
        offsets = sorted(
            draw(
                st.lists(
                    st.integers(0, 600),  # minutes over a 10h span
                    min_size=n_ev,
                    max_size=n_ev,
                    unique=True,
                )
            )
        )
        rows += [(uid, off) for off in offsets]
    return rows


@given(rows=event_sets())
@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_single_batch_drain_matches_batch_derivation(spark, tmp_path, rows):
    """Property: for ANY event set drained in one data batch, the stateful
    sessionizer's output equals the batch-mode session_window result minus
    the sessions the final watermark (max ts − delay) hasn't closed — the
    same rule the catalog oracle encodes, here exercised on randomized
    shapes instead of the one fixture."""
    import uuid as _uuid

    base = pd.Timestamp("2024-03-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [base + pd.Timedelta(minutes=r[1]) for r in rows],
        }
    )
    src = str(tmp_path / f"ev_{_uuid.uuid4().hex[:8]}")
    batch_df = spark.createDataFrame(pdf)
    batch_df.coalesce(1).write.parquet(src)

    streamed = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "1 minute")
    )
    got = {
        (r.user_id, str(r.s_start), str(r.s_end), r.n)
        for r in run_available_now(
            sessionize_stateful(streamed, gap_minutes=10), mode="append"
        ).collect()
    }

    # batch derivation: gaps-and-islands sessions, then the oracle's rule
    gap = pd.Timedelta(minutes=10)
    final_wm = pdf["ts"].max() - pd.Timedelta(minutes=1)
    want = set()
    for uid, g in pdf.groupby("user_id"):
        ts = sorted(g["ts"])
        sessions, cur = [], [ts[0]]
        for t in ts[1:]:
            if t - cur[-1] < gap:
                cur.append(t)
            else:
                sessions.append(cur)
                cur = [t]
        sessions.append(cur)
        for i, s in enumerate(sessions):
            closed_by_data = i < len(sessions) - 1
            timed_out = (s[-1] + gap) < final_wm
            if closed_by_data or timed_out:
                want.add((uid, str(s[0]), str(s[-1] + gap), len(s)))
    assert got == want, (got, want)


def test_late_event_extends_session_start(spark, tmp_path):
    """Round-6 review finding: a watermark-valid LATE event arriving in a
    later batch that belongs to the carried open session must move
    s_start/n, and a late event within gap on the EARLY side must merge —
    the original t-after-e check silently absorbed it without moving
    s_start."""
    batches = [
        # open session for u1 at 10:29:50; u9 pushes the watermark only to
        # 10:29:00 (delay 1 min), so 10:29:10 is still on time
        [(1, "2024-01-01 10:29:50"), (9, "2024-01-01 10:30:00")],
        # late event BEFORE the open session's start, within gap
        [(1, "2024-01-01 10:29:10")],
        # u1 jumps a gap -> the merged session closes with the late start
        [(1, "2024-01-01 11:00:00"), (9, "2024-01-01 11:00:01")],
    ]
    src = tmp_path / "src"
    flat = tmp_path / "flat"
    os.makedirs(flat)
    n = 0
    for i, rows in enumerate(batches):
        d = str(src / f"f{i}")
        (
            spark.createDataFrame(rows, "user_id long, ts_s string")
            .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
            .coalesce(1)
            .write.parquet(d)
        )
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(d, f), str(flat / f"{n:02d}.parquet"))
                n += 1

    events = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
        .withWatermark("ts", "1 minute")
    )
    out = run_available_now(
        sessionize_stateful(events, gap_minutes=10), mode="append"
    )
    u1 = [
        (str(r.s_start), str(r.s_end), r.n)
        for r in out.filter(F.col("user_id") == 1).collect()
    ]
    # ONE u1 session: late 10:29:10 merged in, start moved, both counted
    assert u1 == [("2024-01-01 10:29:10", "2024-01-01 10:39:50", 2)], u1


def test_custom_user_col_keeps_name_and_type(spark, tmp_path):
    """Round-7 advice fix: a caller passing user_col='account_id' must get
    an output keyed 'account_id' with the INPUT column's type — not a
    silently renamed/recast 'user_id long'."""
    src = str(tmp_path / "acct")
    (
        spark.createDataFrame(
            [(7, "2024-01-01 00:00:00"), (7, "2024-01-01 00:02:00")],
            "account_id int, ts_s string",
        )
        .select("account_id", F.col("ts_s").cast("timestamp").alias("ts"))
        .coalesce(1)
        .write.parquet(src)
    )
    streamed = (
        spark.readStream.schema("account_id int, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "1 minute")
    )
    out = sessionize_stateful(streamed, gap_minutes=10, user_col="account_id")
    assert out.schema["account_id"].dataType.simpleString() == "int"
    assert [f.name for f in out.schema.fields] == [
        "account_id",
        "s_start",
        "s_end",
        "n",
    ]
    # schema-only is not enough: drain once so the emitted pandas frame's
    # column names are exercised against the declared schema too
    drained = run_available_now(out, mode="append")
    assert drained.count() == 0  # watermark never passes close time; no rows


def test_entirely_late_session_emits_instead_of_crashing(spark, tmp_path):
    """Probe-found (round 7): a batch can carry a user's events that ALL lie
    below the current watermark (applyInPandasWithState never drops late
    rows). Such a session's close time precedes the watermark, so
    setTimeoutTimestamp would raise INVALID_TIMEOUT_TIMESTAMP; the fix
    emits the session immediately — its timeout is by definition already
    due. Batch 1: u9 at 12:00 pushes the watermark to ~11:59. Batch 2: u5
    entirely at 00:00-00:02 (12 h late) must come out CLOSED, not crash."""
    src = tmp_path / "src"
    flat = tmp_path / "flat"
    os.makedirs(flat)
    batches = [
        [(9, "2024-01-01 12:00:00")],
        [(5, "2024-01-01 00:00:00"), (5, "2024-01-01 00:02:00")],
    ]
    for i, rows in enumerate(batches):
        d = str(src / f"f{i}")
        (
            spark.createDataFrame(rows, "user_id long, ts_s string")
            .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
            .coalesce(1)
            .write.parquet(d)
        )
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(d, f), str(flat / f"{i:02d}_{f}"))
    streamed = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
        .withWatermark("ts", "1 minute")
    )
    got = sorted(
        (r.user_id, str(r.s_start), str(r.s_end), r.n)
        for r in run_available_now(
            sessionize_stateful(streamed, gap_minutes=10), mode="append"
        ).collect()
    )
    assert got == [
        (5, "2024-01-01 00:00:00", "2024-01-01 00:12:00", 2)
    ], got  # u9's session stays open (final watermark 11:59 < 12:10)
