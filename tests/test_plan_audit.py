"""Catalog-wide physical-plan audit: no execution anti-pattern may enter the
declared surface unnoticed.

Sweeps every batch entry's executed plan for the three patterns that destroy
scale — cartesian products, nested-loop joins, and row-at-a-time Python
evaluation — and pins the justified exceptions as explicit allowlists. A new
entry that accidentally plans a cartesian (e.g. a join whose predicate
stopped being an equi-join after a refactor) fails here even while its
values still match the oracle at fixture scale.

Streaming entries are skipped: their builders RUN the drain (the returned
frame is a memory-sink table whose plan says nothing about the stream).
"""

from __future__ import annotations

import pytest

from sql4pandas_spark.queries import load_catalog

SF = "/root/testdata/sf0.001"

#: BroadcastNestedLoopJoin is legitimate exactly where one side is a
#: BROADCAST SINGLE-ROW scalar (the idiomatic scalar-subquery join: thresholds,
#: totals, recall counters) or the entry IS the declared cross join.
BNLJ_ALLOWED = {
    "cross_join_regions",        # the declared cartesian entry
    "q11_important_stock",       # 1-row value-share threshold
    "q22_idle_customers",        # 1-row balance threshold
    "hll_sketch_users",          # 1-row merged-sketch estimate
    "tablesample_orders",        # 1-row population stats
    "incremental_dedup_batches", # 1-row per-batch kept counts
    "incremental_near_dedup_batches",  # 1-row per-batch admitted counts
    "stratified_sample_mix",     # 1-row population total for the frac bound
    "bm25_top15_documents",      # 1-row corpus stats (N, avgdl, per-term df)
    "hybrid_rrf_top10",          # same 1-row BM25 corpus-stats row on the
                                 # lexical side; fuse itself is equi-only
    "key_skew_profile_events",   # 1-row (total_rows, n_keys) summary row
    "join_fanout_orders_lineitem",  # 1-row (total_rows_out, n_keys) row
    "chisq_lang_source",         # 1-row collected b-values array (grid
                                 # spine) + 1-row grand-total row
    "tfidf_top_terms_documents", # 1-row corpus size N
    "lm_surprisal_documents",    # 1-row (N, V) unigram-model normalizer
    "retrieval_ndcg_audit",      # 1-row corpus stats + 1-row DCG/IDCG/
                                 # n_rel scalar rows per query term
    "ivf_recall_census",         # 8-row centroid and 5-row query frames
                                 # broadcast against the corpus — the
                                 # declared deterministic-IVF assignment
                                 # + small-Q brute-force audit shape
    "bigram_surprisal_documents",  # same 1-row (N, V) backoff normalizer
    "bigram_gate_per_lang",      # same 1-row (N, V) normalizer via the
                                 # composed bigram scorer; the gate's own
                                 # threshold join is a broadcast equi-join
    "pmi_pairs_documents",       # 1-row corpus size N for the PMI log
    "classifier_calibrated_gate",  # 1-row p25 score threshold
    "gapfill_interpolate_15m",   # grid build: 5 event types x O(range) spine,
                                 # both tiny and data-volume-independent
    "segment_overlap_events",    # |segments|² signature-pair compare over
                                 # 64-long arrays — data-volume-independent
                                 # by design (that's the whole point of the
                                 # set sketch)
    "truncation_loss_census",    # 3-row literal max_len dim broadcast-cross-
                                 # joined against the token-count frame — the
                                 # declared constant-size length spine
}

#: Row-at-a-time Python evaluation is allowed only in the declared UDTF
#: entries (UDTFs are Python row generators by definition) and the one
#: documented never-for-hot-paths completeness demo.
PYTHON_EVAL_ALLOWED = {
    "udtf_word_rows",
    "udtf_table_arg_summary",
    "udf_python_rowwise",
}


def _batch_entries():
    for name, spec in load_catalog().items():
        if name.startswith("stream_") or "scan_stream" in spec.tags:
            continue
        yield name, spec


@pytest.fixture(scope="module")
def plans(spark):
    spark.sparkContext.setLogLevel("ERROR")
    return {
        name: spec.build(spark, SF)._jdf.queryExecution().executedPlan().toString()
        for name, spec in _batch_entries()
    }


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert bad == [], f"cartesian product planned in {bad}"


def test_nested_loop_joins_only_where_scalar_or_declared(plans):
    bad = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert bad == [], (
        f"BroadcastNestedLoopJoin outside the scalar/cross-join allowlist: {bad} "
        "— if the new usage is a 1-row broadcast scalar join, add it to "
        "BNLJ_ALLOWED with a comment; otherwise the join lost its equi keys"
    )
    stale = [n for n in BNLJ_ALLOWED if n in plans and "BroadcastNestedLoopJoin" not in plans[n]]
    assert stale == [], f"allowlisted entries no longer plan a BNLJ (prune): {stale}"


def test_python_row_eval_only_in_declared_udf_entries(plans):
    bad = [
        n
        for n, p in plans.items()
        if "BatchEvalPython" in p and n not in PYTHON_EVAL_ALLOWED
    ]
    assert bad == [], (
        f"row-at-a-time Python eval leaked into {bad} — hot paths must use "
        "JVM expressions or Arrow-batched pandas UDFs (ArrowEvalPython)"
    )
