"""Behavioral analytics over event logs: ordered funnels and cohort
retention — the two queries every product/growth team runs against the
100 TB clickstream, and the reference's event-table use case (SURVEY.md
§1.2) taken to its analytic conclusion.

Both are pure DataFrame compositions (zero UDFs). The funnel is ONE
groupBy(user) shuffle: events are pre-filtered to the funnel's step types
(predicate pushdown at the scan), collected per user as a sorted
(ts, type) array, and folded through a JVM higher-order ``aggregate``
whose accumulator is the per-step completion timestamps — the greedy
earliest-completion semantics every funnel product (first-touch
anchoring) uses, provably equivalent to the iterative
"min ts of step k strictly after step k-1" definition the SQL oracle
replays. Retention is two narrow shuffles (per-user first-period
aggregate, then a user-keyed join back) over (user, period) pairs only.

Skew note for 100 TB: per-user arrays hold only the funnel's OWN event
types, so a power user contributes |their funnel events|, not |their
events|; a hostile bot with millions of step-type events is the one key
that needs a per-user event cap upstream (filter_with_audit) — the same
discipline as dedup's hot-shingle cap (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-sequence funnel: how many users completed step 1, then
    step 2 strictly after their step-1 time, and so on.

    Returns one row per step: ``(step, event_type, n_users,
    pct_of_first)`` with ``step`` 1-based and ``pct_of_first`` the
    conversion rate against the step-1 population (NULL when nobody
    entered). Semantics are greedy/first-touch: each step's completion
    time is the EARLIEST event of that type strictly after the previous
    step's completion; with ``within_seconds`` set, steps 2..k must also
    land within that many seconds of the user's first step-1 event (the
    anchor — later step-1 events never re-anchor, matching standard
    product-analytics windows). Ties at the exact same timestamp do NOT
    chain (strictly-after), so out-of-order same-ms events can't fake a
    conversion.

    Rows with NULL user, time, or type are ignored. Duplicate step types
    are allowed (e.g. view->click->view): one event fills at most the
    first unfilled step, so a single event never satisfies two steps.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = (
        df.filter(
            F.col(user_col).isNotNull()
            & F.col(time_col).isNotNull()
            & F.col(type_col).isin(steps)
        )
        .select(
            F.col(user_col).alias("_u"),
            F.struct(
                F.col(time_col).alias("ts"), F.col(type_col).alias("et")
            ).alias("_e"),
        )
    )
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def step(acc, x):
        # one transform pass per event, all reads against the OLD acc:
        # filling step i needs acc[i-1] already set by a strictly earlier
        # event, so at most the first unfilled step can fire — duplicate
        # step types can't double-fill from one event
        def fill(a, i):
            prev = F.get(acc, i - 1)  # null at i==0 (out-of-bounds get)
            in_seq = (i == F.lit(0)) | (prev.isNotNull() & (x["ts"] > prev))
            if within_seconds is not None:
                anchor = F.when(i == F.lit(0), x["ts"]).otherwise(
                    F.get(acc, 0)
                )
                in_seq = in_seq & (
                    x["ts"]
                    <= anchor + F.make_interval(secs=F.lit(within_seconds))
                )
            return (
                F.when(a.isNotNull(), a)
                .when((F.get(steps_arr, i) == x["et"]) & in_seq, x["ts"])
                .otherwise(F.lit(None).cast("timestamp"))
            )

        return F.transform(acc, fill)

    per_user = ev.groupBy("_u").agg(
        F.aggregate(
            F.array_sort(F.collect_list("_e")), init, step
        ).alias("hits")
    )
    counts = (
        per_user.select(F.posexplode("hits").alias("step0", "t"))
        .groupBy("step0")
        .agg(F.sum(F.col("t").isNotNull().cast("long")).alias("n_users"))
    )
    # |steps|-row spine keeps the output shape stable even on empty input
    spine = (
        df.sparkSession.range(k)
        .select(F.col("id").cast("int").alias("step0"))
        .withColumn("event_type", F.get(steps_arr, F.col("step0")))
    )
    base = spine.join(counts, "step0", "left").fillna(0, ["n_users"])
    # n_first via a single-partition window over the k-row result — a
    # separate aggregate-and-crossJoin lineage would make Catalyst scan
    # and shuffle the events twice (no subtree reuse across self-joins)
    n_first = F.max(
        F.when(F.col("step0") == 0, F.col("n_users"))
    ).over(Window.partitionBy(F.lit(1)))
    return (
        base.withColumn("n_first", n_first)
        .select(
            (F.col("step0") + 1).alias("step"),
            "event_type",
            "n_users",
            F.when(
                F.col("n_first") > 0,
                F.round(F.col("n_users") * 100.0 / F.col("n_first"), 4),
            ).alias("pct_of_first"),
        )
        .orderBy("step")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    time_col: str,
    bucket: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period (the cohort), then counted in every later period they showed
    up in.

    Returns ``(cohort, period_offset, n_active, retention_pct)`` —
    offset 0 is the cohort's own period (retention 100 by construction),
    ``retention_pct`` is against the cohort's size. ``bucket`` is any
    ``date_trunc`` unit whose periods are uniform in days ('week' or
    'day'; months are not equal-length, so offsets would lie).

    Scale shape: activity collapses to DISTINCT (user, period) pairs
    before anything else (the one early-projection that matters — the
    raw event volume never reaches any later stage), and everything
    downstream is WINDOWS over that single lineage, not aggregate+join
    branches: a per-user min window gives the cohort, and the cohort
    size is read off each cohort's own offset-0 row (every user has
    exactly one). A join-based phrasing makes Catalyst scan the events
    once per branch — three full scans at 100 TB; this plan scans once.
    """
    days = {"day": 1, "week": 7}
    if bucket not in days:
        raise ValueError(f"bucket must be one of {sorted(days)}")
    per = F.date_trunc(bucket, F.col(time_col))
    act = (
        df.filter(F.col(user_col).isNotNull() & F.col(time_col).isNotNull())
        .select(F.col(user_col).alias("_u"), per.alias("period"))
        .distinct()
    )
    cohort = F.min("period").over(Window.partitionBy("_u"))
    r = (
        act.withColumn("cohort", cohort)
        .select(
            "cohort",
            (F.datediff("period", "cohort") / days[bucket])
            .cast("int")
            .alias("period_offset"),
        )
        .groupBy("cohort", "period_offset")
        # rows are distinct (user, period) pairs, so plain count IS the
        # distinct-user count — no Expand needed
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    n_cohort = F.max(
        F.when(F.col("period_offset") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort"))
    return (
        r.withColumn("n_cohort", n_cohort)
        .select(
            "cohort",
            "period_offset",
            "n_active",
            F.round(F.col("n_active") * 100.0 / F.col("n_cohort"), 4).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort", "period_offset")
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_secs: int = 1800,
) -> DataFrame:
    """Batch gap-based sessionization — the classic "new session after
    30 idle minutes" segmentation, the BATCH complement of the streaming
    session windows (queries/streaming_queries.events_session_windows
    computes the same boundaries with watermarked state; this form runs
    over history at rest). One row per (user, session):
    ``(user, session_idx, session_start, session_end, n_events,
    duration_secs)``; session_idx is 1-based in time order.

    Mechanics: lag(ts) over (user ORDER BY ts) flags a session start when
    the gap exceeds ``gap_secs`` (compared in exact epoch MICROSECONDS —
    truncating each timestamp to seconds first would mis-bucket
    sub-second gaps near the threshold), a running sum of start flags
    numbers the sessions, and one groupBy((user, session_idx)) folds the
    stats. Equal-timestamp ties are harmless by construction: within a
    tie group every pairwise gap is 0, so exactly one row carries the
    start flag and all tie rows land in the same session whatever the
    scan order — the (ts -> session) mapping is deterministic.

    Scale shape: ONE exchange on user_col — the window sorts within
    partitions, and the follow-up groupBy(user, session_idx) reuses the
    same hash partitioning (user alone clusters every (user, idx) group),
    so Catalyst plans no second exchange. Skew = a bot user's whole
    history in one task: cap per-user events upstream (the funnel
    module's documented discipline); the window itself is streaming-safe
    (no per-user array materialization).
    """
    df = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )  # unstamped/anonymous events cannot be sessionized, and NULL sort
    # placement differs across engines
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_sess = (
        prev.isNull() | (us - prev > F.lit(int(gap_secs) * 1_000_000))
    ).cast("int")
    sid = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(user_col, F.col(ts_col), sid.alias("session_idx"))
        .groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (
                (
                    F.unix_micros(F.max(ts_col))
                    - F.unix_micros(F.min(ts_col))
                )
                / F.lit(1_000_000)
            )
            .cast("long")
            .alias("duration_secs"),
        )
    )


def top_movers(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    bucket: str = "week",
    min_prev: int = 1,
) -> DataFrame:
    """Trending detection: per (group, time-bucket) activity counts with
    the previous bucket alongside and an integer growth rate — "which
    sources/domains/event types surged this week", the telemetry query
    behind every trending dashboard and crawl-anomaly review (the
    DIRECTIONAL sibling of mad_anomalies: MAD flags a bucket as
    abnormal vs the group's whole history; this ranks CHANGE between
    adjacent buckets).

    Output per (group, bucket_ts) with at least ``min_prev`` events in
    the CALENDAR-ADJACENT previous bucket: ``(group, bucket_ts,
    n_events, prev_events, growth_ppm)`` where growth_ppm =
    (n - prev) * 1_000_000 DIV prev — integer, sign-carrying,
    engine-exact. Adjacency is enforced, not assumed: lag() over
    occupied buckets would otherwise compare a bucket that follows a
    silent period against the LAST ACTIVE bucket — possibly many
    periods back — and report misleading "growth" against stale counts.
    A bucket whose predecessor (bucket_ts − 1 unit) is empty emits no
    row, same as the group's first bucket: growth from silence is
    undefined here. min_prev additionally guards divide-by-tiny noise
    (1 -> 7 events is 600% growth and means nothing).

    A group that went fully SILENT this bucket does not emit a row
    (there is no event to bucket) — absence detection is gapfill's job
    (gapfill_interpolate_15m) feeding this after zero-filling.

    Scale shape: one map-combined groupBy((group, bucket)) over raw
    events, then a lag window over the BOUNDED counts frame — the
    expensive pass exchanges |groups x buckets| narrow rows, and the
    window partitions by group, so no single-task global sort.
    """
    counts = (
        df.filter(F.col(ts_col).isNotNull())  # unstamped events can't bucket
        .groupBy(
            F.col(group_col).alias("grp"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("grp").orderBy("bucket_ts")
    # lag() walks OCCUPIED buckets; gate it on calendar adjacency so a
    # bucket after a silent gap gets NULL prev (excluded below), never a
    # stale count from many periods back
    adjacent = F.lag("bucket_ts").over(w) == F.expr(
        f"timestampadd({bucket.upper()}, -1, bucket_ts)"
    )
    out = counts.withColumn(
        "prev_events", F.when(adjacent, F.lag("n_events").over(w))
    )
    return (
        out.filter(F.col("prev_events") >= min_prev)
        .select(
            F.col("grp").alias(group_col),
            "bucket_ts",
            "n_events",
            "prev_events",
            # sign-magnitude integer division: Spark's DIV truncates
            # toward zero while DuckDB's // floors, so a bare signed
            # division diverges on every DECLINING bucket — divide the
            # absolute change instead and re-apply the sign
            F.expr(
                "CASE WHEN n_events >= prev_events THEN"
                "  (n_events - prev_events) * 1000000 DIV prev_events"
                " ELSE"
                "  -((prev_events - n_events) * 1000000 DIV prev_events)"
                " END"
            ).alias("growth_ppm"),
        )
    )


def ohlc_resample(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Time-series downsample to OHLC bars: per (key, time bucket) the
    Open (value at the earliest event), High, Low, Close (value at the
    latest event) and event count — the classic metrics/market resample
    that turns a raw tick stream into chartable bars and feeds
    mad_anomalies/top_movers at a bounded row count.

    Open/Close pick the row with the extreme ``(ts, id)`` STRUCT via
    min_by/max_by — ONE aggregate, no self-join, no window re-sort; the
    id tie-break makes same-timestamp ticks deterministic across
    engines and partitionings (min_by on ts alone would return an
    arbitrary tied row). High/Low are plain min/max. Values pass
    through untouched (no float arithmetic to diverge).

    Scale shape: a single map-combined groupBy((key, bucket)) — the
    only exchange carries |keys x buckets| narrow rows, each holding
    constant-size state (two struct extremes + two floats + a count).
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    tie = F.struct(F.col(ts_col), F.col(id_col))
    v = F.col(value_col)
    df = df.filter(F.col(ts_col).isNotNull())  # unstamped ticks can't bar
    return df.groupBy(
        F.col(key_col), b.alias("bucket_ts")
    ).agg(
        F.min_by(v, tie).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, tie).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Exact rolling distinct-user counts — DAU / WAU(window_days) /
    stickiness per day, the growth metrics on every product dashboard.
    Output per calendar day of the data span: ``(day, dau, wau,
    stickiness_ppm)`` with stickiness = dau/wau in integer ppm.

    Rolling DISTINCT is the aggregation that naive windowing cannot do
    (distinct state doesn't fold like a sum, so a sliding sum-of-dailies
    overcounts repeat users). The distributed-exact construction:
    collapse to distinct (user, day) pairs, fan each pair out to the
    ``window_days`` window-END days it contributes to (a BOUNDED x7
    multiplier on the already-collapsed pairs, not on raw events), and
    count distinct users per end day — re-deduplicating users active on
    several days of one window. DAU rides the same aggregate via a
    conditional distinct (day == window end).

    Scale shape: exchange 1 = the (user, day) distinct; explode is
    map-side; exchange 2 = the per-day distinct count. The day spine
    (min..max calendar days) comes from a 1-row bound aggregate exploded
    to |days| rows and broadcast onto the counts — gap days (nobody
    active) still report, with wau counting the surrounding window.
    For week-scale windows at 100 TB this beats recomputing a distinct
    per day by window_days x; for very large windows switch to HLL
    sketch unions (operators/sketches) and accept the approximation.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    d = F.date_trunc("day", F.col(ts_col))
    ud = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), d.alias("_d"))
        .distinct()
    )
    contrib = ud.select(
        "_u",
        "_d",
        F.explode(
            F.expr(
                f"sequence(_d, _d + interval {window_days - 1} day,"
                " interval 1 day)"
            )
        ).alias("day"),
    )
    counts = contrib.groupBy("day").agg(
        F.countDistinct("_u").alias("wau"),
        F.countDistinct(F.when(F.col("_d") == F.col("day"), F.col("_u")))
        .alias("dau"),
    )
    spine = ud.agg(F.min("_d").alias("_mn"), F.max("_d").alias("_mx")).select(
        F.explode(
            F.expr("sequence(_mn, _mx, interval 1 day)")
        ).alias("day")
    )
    return (
        spine.join(counts, "day", "left")
        .fillna(0, ["dau", "wau"])
        .select(
            "day",
            "dau",
            "wau",
            F.expr(
                "CASE WHEN wau > 0 THEN dau * 1000000 DIV wau END"
            ).alias("stickiness_ppm"),
        )
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order event-transition matrix: for each ordered pair of
    event types, how often type B immediately follows type A within one
    user's stream, plus the row-normalized share — the empirical Markov
    chain behind "what do users do AFTER a search?". The EXPLORATORY
    sibling of funnel(): a funnel checks one hypothesized path, this
    surfaces all observed adjacent pairs to hypothesize from.

    Transitions never cross users; same-timestamp ties order by
    ``id_col`` so adjacency is deterministic across engines and
    partitionings. ``share_ppm`` = transitions / all transitions OUT of
    the same source type, in integer ppm.

    Scale shape: one exchange on user for the lead() window over raw
    events, then a map-combined groupBy((from, to)) whose output is
    |types|² narrow rows; the share window runs over that bounded
    counts frame (partitioned by from_type — never a single global
    task). Same bot-skew bound as sessionize: one user's stream sorts
    in one task; cap upstream.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        df.filter(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(type_col).isNotNull()
        )
        .select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("n_transitions * 1000000").cast("long").alias("_num"),
        F.sum("n_transitions").over(wf).alias("_den"),
    ).select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("_num DIV _den").alias("share_ppm"),
    )
