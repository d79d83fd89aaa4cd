"""heavy_hitters_topk: accuracy contract under adversarial cardinality.

The catalog oracle proves exactness when cardinality ≤ M; these tests pin
the interesting regime — cardinality ≫ M — where the two-phase shape must
still find the true heavy hitters because skewed items dominate every
batch's top-M."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql4pandas_spark.operators.sketches import heavy_hitters_topk


def _zipfy(spark, n_rows: int):
    """~Zipfian items: item j is hit with weight ∝ 1/(j+1) via a nested
    pmod trick — deterministic, no RNG."""
    return spark.range(n_rows).select(
        F.concat(
            F.lit("item_"),
            F.pmod(F.xxhash64("id"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(400)) + 1)
            .cast("string"),
        ).alias("item")
    )


def test_matches_exact_topk_under_skew(spark):
    df = _zipfy(spark, 200_000).repartition(16)  # many batches, 400+ items
    approx = [(r.item, r.n) for r in heavy_hitters_topk(df, "item", k=10).collect()]
    exact = [
        (r.item, r.n)
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "item")
        .limit(10)
        .collect()
    ]
    assert approx == exact


def test_counts_are_exact_for_returned_items(spark):
    """Errors can only be omissions: every returned count must equal the
    true global count (phase 2 recounts candidates exactly)."""
    df = _zipfy(spark, 50_000).repartition(8)
    got = {r.item: r.n for r in heavy_hitters_topk(df, "item", k=5).collect()}
    truth = {
        r.item: r.n
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got and all(truth[i] == n for i, n in got.items())


def test_candidate_side_is_broadcast(spark):
    df = _zipfy(spark, 10_000)
    plan = (
        heavy_hitters_topk(df, "item", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:1500]


def test_empty_input_yields_empty_topk(spark):
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters_topk(empty, "item", k=5).count() == 0


def test_null_heavy_column_keeps_null_in_topk(spark):
    """Round-6 review finding: NULL is a countable value class (SQL GROUP
    BY has a NULL group). A column whose most frequent value is NULL must
    report it — value_counts(dropna=False) + an eqNullSafe semi-join."""
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, None)
        .otherwise(F.concat(F.lit("v"), (F.col("id") % 50).cast("string")))
        .alias("item")
    ).repartition(4)
    top = [(r.item, r.n) for r in heavy_hitters_topk(df, "item", k=3).collect()]
    assert top[0] == (None, 500), top


# ---------------------------------------------------------------------------
# key skew profile (round 9)
# ---------------------------------------------------------------------------


def test_key_skew_profile_hand_computed(spark):
    """20 rows over 4 keys (one deliberately hot, one NULL): counts, integer
    basis-point shares, and the x100 mean-multiple all match hand math;
    NULL profiles as a key and sorts first among count ties."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.profile import key_skew_profile

    rows = [("a",)] * 12 + [("b",)] * 4 + [(None,)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    got = [tuple(r) for r in key_skew_profile(df, "k", top_k=3).orderBy("rank").collect()]
    # total=20, n_keys=4, mean=5; a: 12 rows -> 6000bp, 240 x100
    assert got[0] == (1, "a", 12, 6000, 240, 20, 4)
    assert got[1] == (2, "b", 4, 2000, 80, 20, 4)
    # NULL (2 rows) ties with "c" (2 rows) and ranks first (nulls first)
    assert got[2] == (3, None, 2, 1000, 40, 20, 4)
    assert len(got) == 3


def test_key_skew_profile_single_groupby_over_data(spark):
    """The only pass over data rows is one map-combined groupBy: the plan
    holds exactly one scan of the input relation."""
    from sql4pandas_spark.operators.profile import key_skew_profile
    from sql4pandas_spark.sources.parquet import register_tables
    from tests.conftest import SF_SMALL

    events = register_tables(spark, SF_SMALL, ("events",))["events"]
    out = key_skew_profile(events, "user_id")
    out.collect()
    # the counts exchange serves both branches via ReusedExchange in the
    # executed plan — single data scan, and NO cache (a persist here had
    # no unpersist point and pinned executor storage; round-9 ADVICE)
    final = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("FileScan parquet") == 1, final
    assert "ReusedExchange" in final
    assert "InMemoryTableScan" not in final


# ---------------------------------------------------------------------------
# MAD volume anomalies (round 9)
# ---------------------------------------------------------------------------


def test_mad_anomalies_hand_computed(spark):
    """7 hourly buckets per group with one planted 100x spike: counts of
    [5,5,6,6,7,7,500] give med=6 (med_x2=12), dev_x2=[2,2,0,0,2,2,988],
    MAD=1 (mad_x4=4) -> only the spike satisfies 2*dev_x2 > 3*mad_x4 ...
    along with the honest near-tie buckets: 2*2=4 > 3*4=12 is FALSE, so
    exactly the spike flags. A steady group flags nothing."""
    import datetime as dt

    from sql4pandas_spark.operators.profile import mad_anomalies

    rows = []
    counts = {0: 5, 1: 5, 2: 6, 3: 6, 4: 7, 5: 7, 6: 500}
    for h, n in counts.items():
        t0 = dt.datetime(2024, 3, 1, h, 0, 0)
        rows += [("spiky", t0 + dt.timedelta(seconds=i)) for i in range(n)]
        rows += [("steady", t0 + dt.timedelta(seconds=i)) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = {
        (r.g, r.bucket_ts.hour): (r.n_events, r.med_x2, r.mad_x4, r.dev_x2)
        for r in mad_anomalies(df, "ts", "g", bucket="hour", k=3).collect()
    }
    assert got == {("spiky", 6): (500, 12, 4, 988)}


def test_mad_flags_spike_a_stddev_zscore_hides(spark):
    """The docstring's robustness claim: one enormous spike inflates the
    stddev enough that its own z-score stays under 3, while the MAD gate
    still flags it."""
    import datetime as dt
    import statistics

    from sql4pandas_spark.operators.profile import mad_anomalies

    counts = [10] * 4 + [1000]  # one point holding ~96% of the variance
    rows = []
    for h, n in enumerate(counts):
        t0 = dt.datetime(2024, 3, 2, h, 0, 0)
        rows += [("g", t0 + dt.timedelta(seconds=i)) for i in range(n)]
    mean = statistics.mean(counts)
    sd = statistics.pstdev(counts)
    assert abs(counts[-1] - mean) / sd < 3  # stddev z-score misses it
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    flagged = mad_anomalies(df, "ts", "g", bucket="hour", k=3).collect()
    assert [r.n_events for r in flagged] == [1000]  # MAD catches it


# ---------------------------------------------------------------------------
# chi-square association (round 9)
# ---------------------------------------------------------------------------


def test_categorical_association_hand_computed(spark):
    """2x2 with a known chi-square: rows a:(8,2), b:(2,8) over n=20.
    Marginals 10/10 each way -> every expected cell is 5; chi2 =
    4 * (3^2/5) = 7.2. Plus a zero-observed cell case in a 2x3."""
    from sql4pandas_spark.operators.profile import categorical_association

    rows = (
        [("x", "p")] * 8 + [("x", "q")] * 2 + [("y", "p")] * 2 + [("y", "q")] * 8
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = {(r.a, r.b): (r.n, r.expected_e6, r.chi2_e6) for r in
           categorical_association(df, "a", "b").collect()}
    assert got == {
        ("x", "p"): (8, 5_000_000, 1_800_000),
        ("x", "q"): (2, 5_000_000, 1_800_000),
        ("y", "p"): (2, 5_000_000, 1_800_000),
        ("y", "q"): (8, 5_000_000, 1_800_000),
    }
    assert sum(v[2] for v in got.values()) == 7_200_000


def test_categorical_association_zero_cell_contributes_expected(spark):
    """A never-observed (a, b) combination still appears with n=0 and
    chi2 contribution == its expected count ((0-e)^2/e = e)."""
    from sql4pandas_spark.operators.profile import categorical_association

    rows = [("x", "p")] * 6 + [("x", "q")] * 2 + [("y", "p")] * 2
    df = spark.createDataFrame(rows, "a string, b string")
    got = {(r.a, r.b): (r.n, r.expected_e6, r.chi2_e6) for r in
           categorical_association(df, "a", "b").collect()}
    assert len(got) == 4  # full 2x2 grid despite 3 observed cells
    n0, e0, c0 = got[("y", "q")]
    # row y total 2, col q total 2, n 10 -> e = 2*2/10 = 0.4
    assert n0 == 0 and e0 == c0 == 400_000


def test_robust_outlier_rows_hand_computed(spark):
    """Group values [10,10,12,12,14,14,100]: med=12 (x2=24),
    dev_x2=[4,4,0,0,4,4,176], MAD_x4=8 -> at k=3 only 100 flags
    (2*176=352 > 24); the near-ties (2*4=8 > 24 false) stay."""
    from sql4pandas_spark.operators.profile import robust_outlier_rows

    vals = [10, 10, 12, 12, 14, 14, 100]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, x long")
    got = [
        (r.x, r.med_x2, r.mad_x4, r.dev_x2)
        for r in robust_outlier_rows(df, "x", "grp", k=3).collect()
    ]
    assert got == [(100, 24, 8, 176)]


def test_robust_outlier_rows_null_group_and_approx_path(spark):
    """NULL group is a group (null-safe joins); the approx path flags the
    same obvious outlier on this easy distribution."""
    from sql4pandas_spark.operators.profile import robust_outlier_rows

    rows = [(None, v) for v in [5, 5, 5, 5, 500]] + [("g", 7)] * 3
    df = spark.createDataFrame(rows, "grp string, x long")
    exact = robust_outlier_rows(df, "x", "grp", k=3).collect()
    assert [(r.grp, r.x) for r in exact] == [(None, 500)]
    approx = robust_outlier_rows(df, "x", "grp", k=3, exact=False).collect()
    assert [(r.grp, r.x) for r in approx] == [(None, 500)]
