#!/usr/bin/env python
"""Scaling probe: replicate the sf0.1 fixtures ~Nx into /tmp (join keys
shifted consistently so query semantics are preserved), then run the
headline catalog queries unchanged against the synthetic dir and report
runtime scaling vs sf0.1.

Purpose: measured evidence for the scale story — the catalog builders take
an sf_dir, so the SAME code paths that pass the correctness gate are timed
at 10x data. Writes nothing inside the repo; synthetic data lives in /tmp.

Run:  python tools/scale_probe.py [replication_factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.queries import load_catalog  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402
from sql4pandas_spark.sources.parquet import TABLES  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
#: headline queries: scan+agg, 3-way join+topk, window, tumbling agg, plus
#: the round-3 pipeline surface: composite training-data pipeline (stresses
#: the dedup digest shuffle at 10× input), deterministic hash sampling, and
#: the broadcast-matmul pair search. range_join_nokey_buckets is NOT probed:
#: replication multiplies event density in a FIXED time range, so its output
#: pair count grows quadratically by construction — a data-shape artifact,
#: not an operator-scaling signal.
QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_top3_orders_per_customer",
    "events_hourly",
    "pipeline_end_to_end",
    "hash_sample_orders",
    "cosine_top20_pairs",
    # round-8 additions — the round-7/8 operators no probe covered yet:
    # tfidf (vocabulary-keyed second shuffle at fixed vocab), top-bigrams
    # (fixed key space vs combiner efficiency), weighted sampling
    # (TakeOrdered at 10x width), classifier (pure map — should track the
    # scan), merge upsert (anti-join with a 10x changeset), and the
    # passage-dedup pair. NOTE on the passage ops: replication makes every
    # replica an exact whole-doc duplicate, so ~ALL gram sites become
    # duplicated — the probe deliberately measures the WORST-case join-back
    # fan-in/output regime (real corpora have sparse duplication), same
    # caveat class as the dedup_scale_probe's planted-duplicate note.
    "tfidf_top_terms_documents",
    "top_bigrams_documents",
    "weighted_sample_docs",
    "classifier_scores_documents",
    "merge_upsert_documents",
    "dedup_substring_spans",
    "scrub_passages_documents",
)
#: fact tables replicated with a shifted key; everything else symlinks (dims)
SHIFT_KEY = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _orderkey_span(spark) -> int:
    """lineitem and orders MUST share one span or replica joins misalign
    (safe today only because every order has lineitems — shared max is the
    defensive form)."""
    return max(
        spark.read.parquet(os.path.join(BASE_SF, "lineitem.parquet"))
        .agg(F.max("l_orderkey")).collect()[0][0],
        spark.read.parquet(os.path.join(BASE_SF, "orders.parquet"))
        .agg(F.max("o_orderkey")).collect()[0][0],
    ) + 1


def build_scaled(spark, out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    shared_span = None
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t not in SHIFT_KEY:
            if not os.path.exists(dst):
                os.symlink(os.path.join(BASE_SF, f"{t}.parquet"), dst)
            continue
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(os.path.join(BASE_SF, f"{t}.parquet"))
        key = SHIFT_KEY[t]
        if key.endswith("_orderkey"):
            shared_span = shared_span or _orderkey_span(spark)
            span = shared_span
        else:
            span = df.agg(F.max(key)).collect()[0][0] + 1
        parts = [
            df.select(
                *[
                    (F.col(c) + i * span).alias(c) if c == key else F.col(c)
                    for c in df.columns
                ]
            )
            for i in range(factor)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # several files so the scan parallelizes (single-row-group fixture
        # files cap scan parallelism at 1 task — see BASELINE.md)
        out.repartition(8).write.mode("overwrite").parquet(dst)


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    catalog = load_catalog()
    times = {}
    for name in QUERIES:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            catalog[name].build(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    return times


def main() -> None:
    # S4PS_PROBE_QUERIES=a,b,c probes just the named queries (e.g. the
    # text-op subset at 30x, where timing the whole set — incl. the
    # all-pairs cosine entry — would dominate the run)
    global QUERIES
    only = os.environ.get("S4PS_PROBE_QUERIES", "")
    if only:
        QUERIES = tuple(n.strip() for n in only.split(",") if n.strip())
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = f"/tmp/s4ps_scale_x{factor}"
    spark = get_spark(app_name="s4ps-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build_scaled(spark, out_dir, factor)
    build_s = round(time.time() - t0, 1)
    base = time_queries(spark, BASE_SF)
    scaled = time_queries(spark, out_dir)
    report = {
        "factor": factor,
        "build_s": build_s,
        "base_s": base,
        "scaled_s": scaled,
        "scaling": {
            q: round(scaled[q] / base[q], 2) if base[q] else None for q in QUERIES
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
