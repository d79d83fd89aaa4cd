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
