#!/usr/bin/env python
"""Streaming scale probe: the stateful sessionizer and the exactly-once
foreachBatch sink at Nx event density (default 30x), the two streaming
surfaces the round-5 probe predates.

What it measures (round-7 verdict item #5):

1. ``sessionize_stateful`` over the replicated events stream — drain time,
   emitted sessions, and the STATE-STORE size from the query's own
   progress metrics (``stateOperators[].numRowsTotal`` / memory). The
   design claim under test: state is one tuple per OPEN session per user,
   so state rows stay ~= distinct users while input grows Nx (replication
   multiplies event density, not the user population).
2. ``run_foreach_batch_parquet(exactly_once=True)`` — drain time across
   SEVERAL micro-batches (maxFilesPerTrigger chunks the availableNow
   drain), then sink row count vs the batch-mode count of the same filter
   (equality = nothing lost, nothing duplicated across the per-batch
   dynamic partition overwrites).

Reuses tools/scale_probe.py's replica builder (/tmp, nothing in the repo).

Run:  python tools/streaming_scale_probe.py [factor]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.session import get_spark  # noqa: E402
from sql4pandas_spark.streaming.stateful import sessionize_stateful  # noqa: E402
from sql4pandas_spark.streaming.windows import (  # noqa: E402
    _stream_dir,
    run_foreach_batch_parquet,
)
from tools.scale_probe import BASE_SF, build_scaled  # noqa: E402


def drain_with_progress(result, mode: str, files_per_trigger: int | None = None):
    """availableNow drain into a memory sink, returning (rows, progress
    list) — recentProgress carries the state-store metrics the probe is
    after, which run_available_now (test helper) does not expose."""
    name = f"s4ps_probe_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="s4ps_probe_ckpt_")
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.isActive:
        q.stop()
    rows = result.sparkSession.table(name).count()
    return rows, [p for p in q.recentProgress if p]


def state_stats(progress) -> dict:
    ops = [p["stateOperators"] for p in progress if p.get("stateOperators")]
    if not ops:
        return {}
    last = ops[-1][0]
    return {
        "state_rows": last.get("numRowsTotal"),
        "state_bytes": last.get("memoryUsedBytes"),
        "batches": len(ops),
    }


def probe_sessionizer(spark, sf_dir: str, files_per_trigger: int | None) -> dict:
    src_dir = _stream_dir(sf_dir)
    reader = spark.readStream.schema(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    )
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    events = (
        reader.parquet(src_dir)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", "1 minute")
    )
    t0 = time.perf_counter()
    n_rows, progress = drain_with_progress(
        sessionize_stateful(events, gap_minutes=10), mode="append"
    )
    dt = round(time.perf_counter() - t0, 2)
    n_users = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("user_id")
        .distinct()
        .count()
    )
    return {
        "drain_s": dt,
        "sessions_emitted": n_rows,
        "distinct_users": n_users,
        **state_stats(progress),
    }


def probe_exactly_once_sink(spark, sf_dir: str, files_per_trigger: int | None) -> dict:
    src_dir = _stream_dir(sf_dir)
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    reader = spark.readStream.schema(schema)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    filtered = (
        reader.parquet(src_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type", "value")
    )
    out = tempfile.mkdtemp(prefix="s4ps_probe_sink_")
    t0 = time.perf_counter()
    sink = run_foreach_batch_parquet(
        filtered, out, timeout_sec=600, exactly_once=True
    )
    got = sink.count()
    dt = round(time.perf_counter() - t0, 2)
    want = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .filter(F.col("event_type").isin("click", "purchase"))
        .count()
    )
    n_batches = sink.select("batch_id").distinct().count()
    return {
        "drain_s": dt,
        "sink_rows": got,
        "batch_rows": want,
        "delivery_exact": got == want,
        "micro_batches": n_batches,
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out_dir = f"/tmp/s4ps_scale_x{factor}"
    spark = get_spark(app_name="s4ps-streaming-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build_scaled(spark, out_dir, factor)
    build_s = round(time.time() - t0, 1)

    report = {"factor": factor, "build_s": build_s}
    for label, sf_dir, fpt in (
        ("base", BASE_SF, None),
        # chunk the scaled drain into several micro-batches so the
        # cross-batch state path and per-batch overwrites actually exercise
        ("scaled", out_dir, 2),
    ):
        report[f"sessionizer_{label}"] = probe_sessionizer(spark, sf_dir, fpt)
        report[f"sink_{label}"] = probe_exactly_once_sink(spark, sf_dir, fpt)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
