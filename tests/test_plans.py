"""Physical-plan regression tests — the 100 TB properties (SURVEY.md §4.2).

Correctness tests prove the small-SF answer; these prove the plan SHAPE that
makes the same query viable at cluster scale: filters reaching the parquet
scan, pruned read schemas, broadcast joins for dimensions, rank-limit
pushdown for per-group top-k. If a refactor silently loses one of these, this
file fails even though every value still matches."""

from __future__ import annotations

from sql4pandas_spark.plans import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
)
from sql4pandas_spark.queries import load_catalog
from tests.conftest import SF_SMALL

CATALOG = load_catalog()


def test_q1_filter_pushdown_and_column_pruning(spark):
    df = CATALOG["q1_pricing_summary"].build(spark, SF_SMALL)
    assert has_pushed_filters(df, "l_shipdate"), "shipdate filter must reach the scan"
    cols = set(read_schema_columns(df))
    assert cols <= {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }, f"scan reads more than the 6 needed columns: {cols}"


def test_q1_single_aggregation_shuffle(spark):
    df = CATALOG["q1_pricing_summary"].build(spark, SF_SMALL)
    # one exchange for the partial->final agg, one for the tiny final sort
    assert count_exchanges(df) <= 2, formatted_plan(df)


def test_q5_broadcasts_dimension_tables(spark):
    df = CATALOG["q5_local_supplier_volume"].build(spark, SF_SMALL)
    assert has_broadcast_join(df), "dimension joins should be broadcast-hash"


def test_q3_uses_top_k_sort_not_global_sort(spark):
    df = CATALOG["q3_shipping_priority"].build(spark, SF_SMALL)
    assert "TakeOrderedAndProject" in formatted_plan(df), (
        "ORDER BY + LIMIT must compile to a top-k, not a full sort"
    )


def test_window_topk_rank_limit_pushdown(spark):
    df = CATALOG["window_top3_orders_per_customer"].build(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, (
        "rn<=3 should push a per-group rank limit below the window sort"
    )


def test_semi_join_plans_as_semi_not_inner(spark):
    df = CATALOG["semi_customers"].build(spark, SF_SMALL)
    assert "LeftSemi" in formatted_plan(df)


def test_dedup_exact_shuffles_digest_not_text(spark):
    df = CATALOG["dedup_exact_keepers"].build(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "sha2" in plan, "exact dedup must group on the content digest"


def test_ngram_jaccard_has_no_cartesian_product(spark):
    """The inverted-index join must never degrade to a cross product — at
    scale that's the difference between n·shingles and n² pairs."""
    df = CATALOG["dedup_ngram_jaccard"].build(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scan_pandas_dim_is_broadcast(spark):
    df = CATALOG["scan_pandas_join"].build(spark, SF_SMALL)
    assert has_broadcast_join(df), "the 25-row pandas dim must broadcast"


def test_pivot_has_static_schema_without_distinct_job(spark):
    """Explicit pivot values → output schema is known before any job runs."""
    df = CATALOG["pivot_status_by_year"].build(spark, SF_SMALL)
    assert df.columns == ["y", "F", "O", "P"]


def test_corr_subquery_is_decorrelated_to_aggregate_join(spark):
    """Catalyst must rewrite the correlated scalar subquery into agg+join —
    a per-row re-execution plan would be unrunnable at scale."""
    df = CATALOG["corr_subq_cheapest_per_brand"].build(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "min(" in plan and ("Join" in plan or "BroadcastHashJoin" in plan)


def test_partitioned_sink_prunes_partitions(spark):
    """A filter on the partition column of a partitionBy() sink must become
    PartitionFilters (directory pruning), not a data filter over every file."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sql4pandas_spark.plans import has_partition_filters
    from sql4pandas_spark.sources.parquet import register_tables

    t = register_tables(spark, SF_SMALL, ("documents",))
    out = os.path.join(tempfile.gettempdir(), "s4ps_prune_probe")
    (
        t["documents"]
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(F.col("lang") == "en").select("doc_id")
    assert has_partition_filters(df, "lang"), (
        "partition-column filter must prune directories, not scan all files"
    )


def test_decontamination_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast — shuffling exploded document
    shingles against a KB-sized benchmark would be the wrong plan at 100 TB."""
    df = CATALOG["decontaminate_documents"].build(spark, SF_SMALL)
    assert has_broadcast_join(df), "benchmark shingle join should be broadcast-hash"


def test_lateral_subquery_decorrelates_to_window_rank(spark):
    """The correlated LATERAL top-k must rewrite to a window/rank-limit plan
    (one shuffle), never a per-row subquery re-execution or nested loop."""
    df = CATALOG["lateral_top_orders"].build(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, "per-group LIMIT should push a rank limit"
    assert "BroadcastNestedLoopJoin" not in plan


def test_aqe_splits_skewed_sort_merge_join(spark):
    """Skew handling at scale is delegated to AQE's runtime skew-join split
    (salted_join is the explicit fallback). Prove the mechanism actually
    fires: a join with one hot key must show SortMergeJoin(skew=true) in the
    FINAL adaptive plan. Thresholds are lowered so fixture-sized shuffles
    qualify; the executed Dataset itself is inspected because AQE finalizes
    plans per-execution."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 3 != 0, F.lit(0)).otherwise(F.col("id") % 32).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 32).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "hot key did not trigger an AQE skew split"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_shuffle_hash_hint_is_honored(spark):
    """The SHUFFLE_HASH hint must produce a ShuffledHashJoin (no sort
    passes), not fall back to sort-merge."""
    df = CATALOG["join_hint_shuffle_hash"].build(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "ShuffledHashJoin" in plan, "hint not honored"


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark):
    """A filtered dim joined to a lang-partitioned fact must inject a
    dynamicpruning expression into the fact scan's PartitionFilters — at
    100 TB this is the difference between scanning every partition and
    scanning only the dim-selected ones (partitions aren't known until the
    dim side runs, so static pruning can't do it)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sql4pandas_spark.sources.parquet import register_tables

    t = register_tables(spark, SF_SMALL, ("documents",))
    out = os.path.join(tempfile.gettempdir(), "s4ps_dpp_probe")
    (
        t["documents"]
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("en", "keep"), ("fr", "keep"), ("de", "drop")], "lang string, tag string"
    )
    df = (
        fact.join(dim.filter(F.col("tag") == "keep"), "lang")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "expected dynamicpruningexpression in the fact scan's "
        f"PartitionFilters:\n{plan[:2000]}"
    )


def test_runtime_bloom_filter_prunes_large_shuffle_join(spark):
    """When neither side broadcasts, a selective filter on one side must
    inject a runtime bloom filter (might_contain) into the other side's
    scan — Spark's row-level runtime filtering, the non-partitioned
    counterpart of DPP. Thresholds are lowered to make the optimizer treat
    the local fixture as 'large', exactly as a cluster job tunes them
    relative to its table sizes."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    big_path = os.path.join(tempfile.gettempdir(), "s4ps_bloom_big")
    med_path = os.path.join(tempfile.gettempdir(), "s4ps_bloom_med")
    spark.range(300_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("pay")
    ).write.mode("overwrite").parquet(big_path)
    spark.range(100_000).select(
        F.col("id").alias("k2"), (F.col("id") % 100).alias("grp")
    ).write.mode("overwrite").parquet(med_path)

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        bigp = spark.read.parquet(big_path)
        medp = spark.read.parquet(med_path)
        df = bigp.join(
            medp.filter(F.col("grp") == 7), F.col("k") == F.col("k2")
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), (
            f"expected a runtime bloom filter on the big side:\n{plan[:2000]}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_classifier_score_is_shuffle_free(spark):
    """The hashed-logistic classifier must be ONE map-side expression:
    weights ride as an array literal, the token fold is a JVM HOF — any
    Exchange in the plan means a join/shuffle crept into a path that
    should scale as a pure scan."""
    from sql4pandas_spark.operators.text import hashed_logistic_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    scored = hashed_logistic_score(df)
    assert count_exchanges(scored) == 0, formatted_plan(scored)


def test_passage_spans_two_exchanges_one_scan(spark):
    """duplicate_passage_spans = exactly two shuffles (gram window, doc
    window; the (doc_id, run_id) groupBy reuses the doc_id partitioning)
    over ONE evaluation of the gram-hash subtree. The groupBy+join-back
    form this replaced scanned and hashed everything twice — the plan
    property IS the round-8 perf fix, so pin it."""
    from sql4pandas_spark.operators.dedup import duplicate_passage_spans

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    spans = duplicate_passage_spans(docs, min_tokens=20)
    plan = formatted_plan(spans)
    assert count_exchanges(spans) == 2, plan
    # formatted plans list every node twice (tree + detail section), so a
    # single scan node appears exactly twice in the text
    assert plan.count("Scan parquet") == 2, plan


def test_merge_upsert_anti_join_broadcasts_change_keys(spark):
    """The CDC apply must broadcast the (small) change-key side of the
    anti-join so the snapshot never shuffles — the property that makes
    MERGE viable against a 100 TB snapshot."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.maintenance import merge_upsert

    snap = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    changes = spark.range(50).select(
        F.col("id").alias("k"), F.lit(0).alias("v"), F.lit("update").alias("op")
    )
    post = merge_upsert(snap, changes, ["k"])
    post.collect()  # AQE finalizes join strategies at runtime
    plan = post._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
