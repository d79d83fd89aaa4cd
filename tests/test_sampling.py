"""quota_sample invariants: exact per-stratum counts, determinism across
partitionings, the keep-all branch, the shortfall guard, and the scale-shape
claim that the window only ever sees the pre-filtered survivors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql4pandas_spark.operators.sampling import quota_sample


def _corpus(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("stratum"),
    )


def test_exact_counts_and_determinism(spark):
    df = _corpus(spark)
    kept = quota_sample(df, "stratum", quota=30, verify=True)
    counts = {r.stratum: r.n for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts == {f"s{i}": 30 for i in range(4)}
    # identical membership under a different partitioning
    again = quota_sample(df.repartition(13), "stratum", quota=30)
    ids = lambda d: sorted(r.doc_id for r in d.collect())
    assert ids(kept) == ids(again)


def test_keep_all_branch_under_quota(spark):
    df = _corpus(spark, n=40)  # 10 per stratum, quota 30
    kept = quota_sample(df, "stratum", quota=30, verify=True)
    assert kept.count() == 40


def test_shortfall_guard_raises(spark):
    # safety so small the hash pre-filter cannot retain quota rows
    with pytest.raises(RuntimeError, match="shortfall"):
        quota_sample(_corpus(spark), "stratum", quota=100, safety=0.1, verify=True)


def test_quota_must_be_positive(spark):
    with pytest.raises(ValueError, match="positive"):
        quota_sample(_corpus(spark), "stratum", quota=0)


def test_prefilter_bounds_window_input(spark):
    """The rows reaching the rank shuffle must be ~safety*quota per
    over-quota stratum, not the whole input — the claim that makes the
    operator skew-immune at scale."""
    df = _corpus(spark, n=4000)  # 1000 per stratum
    kept = quota_sample(df, "stratum", quota=20, safety=2.0)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "EvalPython" not in plan
    # survivors = rows passing the hash cutoff; reconstruct the pre-filter
    # and check it is a small superset of the kept set
    from sql4pandas_spark.operators.text import portable_hash60

    import math

    m = 2.0 * 20 + 16 + 4 * math.sqrt(2.0 * 20)
    cutoff = m / 1000 * float(1 << 60)
    surv = df.filter(
        portable_hash60(F.col("doc_id").cast("string")).cast("double") < cutoff
    ).count()
    assert kept.count() == 80
    assert surv < 500  # ~4 strata * m≈81 expected, far below 4000


def test_temperature_sample_upweights_rare_strata(spark):
    from sql4pandas_spark.operators.sampling import temperature_sample

    # 900 in s0, 100 in s1: natural mix 90/10; alpha=0.5 pushes toward 75/25
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "s0").otherwise("s1").alias("stratum"),
    )
    kept = temperature_sample(df, "stratum", alpha=0.5, target_total=400)
    counts = {
        r.stratum: r.n
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    # expected: q = (30, 10)/40 -> keep 300 of s0 (1/3 rate), 100 of s1 (all)
    assert counts["s1"] == 100  # rare stratum fully kept (frac capped at 1)
    assert 240 <= counts["s0"] <= 360  # ~300 expected, binomial spread
    # determinism across partitionings
    again = temperature_sample(
        df.repartition(7), "stratum", alpha=0.5, target_total=400
    )
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_temperature_alpha_one_is_uniform_rate(spark):
    from sql4pandas_spark.operators.sampling import temperature_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "s0").otherwise("s1").alias("stratum"),
    )
    # alpha=1 keeps the natural mix: every stratum gets rate T/N = 0.4
    kept = temperature_sample(df, "stratum", alpha=1.0, target_total=400)
    counts = {
        r.stratum: r.n
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert 310 <= counts["s0"] <= 410 and 25 <= counts["s1"] <= 55


def test_null_stratum_is_a_stratum(spark):
    """Round-6 review finding: a NULL stratum must behave like any GROUP BY
    group (the counts join is null-safe), not silently vanish — and with
    verify=True must not fake a shortfall no safety value can fix."""
    from sql4pandas_spark.operators.sampling import quota_sample, temperature_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "s0").alias("stratum"),  # half NULL
    )
    kept = quota_sample(df, "stratum", quota=10, verify=True)
    counts = {
        r.stratum: r.n
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"s0": 10, None: 10}
    # temperature path: NULL stratum keeps its temperature share too
    t = temperature_sample(df, "stratum", alpha=1.0, target_total=100)
    assert t.filter(F.col("stratum").isNull()).count() == 50


# ------------------------------------------------------------ split_assign


def test_split_assign_matches_python_md5_reference(spark):
    """Differential vs a pure-Python replay of the hash, bucketing, and
    boundaries — every row assigned, deterministically, to the split the
    reference computes."""
    import hashlib

    from sql4pandas_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    got = {
        r.doc_id: r.split
        for r in split_assign(
            df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s1"
        ).collect()
    }

    def ref(key):
        h = int(hashlib.md5(f"s1{key}".encode()).hexdigest()[:15], 16)
        b = h % 1_000_000
        return "train" if b < 800_000 else ("val" if b < 900_000 else "test")

    assert len(got) == 500
    assert got == {i: ref(i) for i in range(500)}


def test_split_assign_stable_under_repartition_and_salt_rerolls(spark):
    from sql4pandas_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    splits = {"train": 0.9, "test": 0.1}
    a = dict(
        split_assign(df, "doc_id", splits).select("doc_id", "split").collect()
    )
    b = dict(
        split_assign(df.repartition(13), "doc_id", splits)
        .select("doc_id", "split")
        .collect()
    )
    assert a == b  # partitioning-independent
    c = dict(
        split_assign(df, "doc_id", splits, salt="v2")
        .select("doc_id", "split")
        .collect()
    )
    assert a != c  # a salt re-rolls the assignment


def test_split_assign_closes_the_bucket_range(spark):
    """Fractions whose cumulative rounding lands at n_buckets-1 must not
    leave the top bucket unassigned — the last boundary is forced to
    n_buckets, so no row gets a NULL split."""
    from sql4pandas_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = split_assign(
        df, "doc_id", {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, n_buckets=7
    )
    assert out.filter(out.split.isNull()).count() == 0
    assert set(r.split for r in out.select("split").distinct().collect()) <= {
        "a",
        "b",
        "c",
    }


def test_split_assign_validates_fractions(spark):
    import pytest

    from sql4pandas_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", {})
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", {"a": 1.5, "b": -0.5})


# ---------------------------------------------------------------------------
# leakage-safe group split (round 9)
# ---------------------------------------------------------------------------


def test_group_safe_split_no_group_spans_two_splits(spark):
    """The structural invariant: every member of a group gets the group's
    split — across 200 docs in 40 groups, zero groups straddle splits,
    and the assignment is refeed-stable (same result on a re-built frame)."""
    from sql4pandas_spark.operators.sampling import group_safe_split

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    labels = docs.select("doc_id", (F.col("doc_id") % 40).alias("cluster_id"))
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = group_safe_split(docs, labels, splits)
    spans = (
        a.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spans == 0
    assert a.count() == 200
    b = group_safe_split(docs, labels, splits)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cluster_safe_split_kills_fixture_leakage(spark):
    """On the sf0.01 fixture the doc-keyed split provably leaks (the
    split_leakage_audit entry finds 3 near-dup pairs crossing the 90/10
    boundary); keying on the near-dup cluster drives cross-split near-dup
    pairs to exactly zero on the same corpus."""
    from sql4pandas_spark.operators import dedup
    from sql4pandas_spark.operators.sampling import group_safe_split, split_assign
    from sql4pandas_spark.sources.parquet import register_tables
    from tests.conftest import SF_SMALL

    docs = register_tables(spark, SF_SMALL, ("documents",))["documents"]
    labels = dedup.near_dedup_minhash(docs)

    def cross_pairs(assigned):
        sides = assigned.select("doc_id", "cluster_id", "split")
        multi = (
            sides.groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("k"), F.count(F.lit(1)).alias("n"))
            .filter((F.col("n") > 1) & (F.col("k") > 1))
        )
        return multi.count()

    doc_keyed = split_assign(
        docs.join(labels, "doc_id"), "doc_id", {"train": 0.90, "val": 0.10}
    )
    cluster_keyed = group_safe_split(docs, labels, {"train": 0.90, "val": 0.10})
    assert cross_pairs(doc_keyed) > 0  # the fixture's real leakage
    assert cross_pairs(cluster_keyed) == 0
