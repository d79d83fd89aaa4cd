"""Streaming semantics beyond the declared queries: batch↔stream equivalence
for every window kind, and the watermark actually dropping late data (the
declared oracle can't see that — the fixture has no late rows)."""

from __future__ import annotations

import os
import tempfile
import time

import pytest

from pyspark.sql import functions as F

from sql4pandas_spark.sources.parquet import table
from sql4pandas_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
    session_windows_10m,
    sliding_30m,
    tumbling_hourly,
)
from tests.conftest import SF_SMALL, assert_frames_match


def test_sliding_batch_equivalence(spark):
    batch = sliding_30m(table(spark, SF_SMALL, "events")).toPandas()
    stream = run_available_now(
        sliding_30m(read_events_stream(spark, SF_SMALL)), mode="complete"
    ).toPandas()
    assert_frames_match(stream, batch, "sliding stream==batch")


def test_session_batch_equivalence(spark):
    batch = session_windows_10m(table(spark, SF_SMALL, "events")).toPandas()
    stream = run_available_now(
        session_windows_10m(read_events_stream(spark, SF_SMALL)), mode="complete"
    ).toPandas()
    assert_frames_match(stream, batch, "session stream==batch")


def test_watermark_drops_late_rows(spark):
    """Three files → three micro-batches (mtime-ordered): batches 1-2 advance
    the watermark far past the 00:00 window; batch 3's very-late row must be
    dropped in update mode. (Measured Spark behavior: the input-row watermark
    filter takes effect one batch after the watermark advances, hence the
    middle batch.)"""
    d = tempfile.mkdtemp(prefix="s4ps_late_")
    now = time.time()

    def write_file(name: str, ts_list: list[str], mtime: float) -> None:
        df = spark.createDataFrame([(t,) for t in ts_list], "ts_s string").select(
            F.col("ts_s").cast("timestamp").alias("ts")
        )
        df.coalesce(1).write.parquet(os.path.join(d, name))
        # FileStreamSource orders by modification time — pin the batch order
        for root, _dirs, files in os.walk(os.path.join(d, name)):
            for fn in files:
                os.utime(os.path.join(root, fn), (mtime, mtime))

    write_file("f1", ["2024-01-01 00:10:00", "2024-01-01 12:00:00"], now - 300)
    write_file("f2", ["2024-01-01 13:00:00"], now - 200)  # watermark → 12:00
    write_file("f3", ["2024-01-01 00:20:00"], now - 100)  # 11h40m late

    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("w"), "n")
    )
    out = run_available_now(agg, mode="update").toPandas()
    counts = dict(zip(out.w.astype(str), out.n))
    # the late row must NOT have been added to the 00:00 window
    assert counts.get("2024-01-01 00:00:00", 0) == 1, counts


def test_tumbling_stream_incremental_two_batches(spark):
    """maxFilesPerTrigger=1 over a 2-file copy → two micro-batches; complete
    mode must still converge to the batch answer (state carries across)."""
    d = tempfile.mkdtemp(prefix="s4ps_twofiles_")
    ev = table(spark, SF_SMALL, "events")
    a, b = ev.randomSplit([0.5, 0.5], seed=42)
    a.write.parquet(os.path.join(d, "f1"))
    b.write.parquet(os.path.join(d, "f2"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    got = run_available_now(tumbling_hourly(stream), mode="complete").toPandas()
    want = tumbling_hourly(ev).toPandas()
    assert_frames_match(got, want, "two-batch tumble == batch")


def test_gapfill_fills_injected_gaps(spark):
    """Remove one interior hour from events; the gap-filled series must still
    contain that hour, with n = 0."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.queries import load_catalog
    from sql4pandas_spark.sources.parquet import register_tables

    t = register_tables(spark, SF_SMALL, ("events",))
    ev = t["events"]
    hours = [r.w for r in (
        ev.select(F.date_trunc("hour", "ts").alias("w")).distinct().orderBy("w").collect()
    )]
    assert len(hours) >= 3
    victim = hours[1]
    from sql4pandas_spark.sources.parquet import invalidate_registered_views

    ev.filter(F.date_trunc("hour", "ts") != victim).createOrReplaceTempView("events")
    # the raw clobber bypasses register_tables' memo — invalidate so the
    # finally-block restore below actually re-registers the real view
    invalidate_registered_views(spark, ("events",))
    try:
        # rebuild via the same operator body, but over the gapped view
        gapped = spark.sql("SELECT * FROM events")
        bounds = gapped.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        spine = bounds.select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("w"))
        hourly = gapped.groupBy(F.date_trunc("hour", "ts").alias("w")).agg(F.count(F.lit(1)).alias("n"))
        filled = {r.w: r.n for r in spine.join(hourly, "w", "left")
                  .select("w", F.coalesce("n", F.lit(0).cast("long")).alias("n")).collect()}
        assert filled[victim] == 0, "injected gap must appear with n=0"
        # spine must be contiguous hourly steps (sf0.001 has natural gaps
        # too — they must also be present, filled with 0)
        ws = sorted(filled)
        assert all(
            (b - a).total_seconds() == 3600 for a, b in zip(ws, ws[1:])
        ), "gap-filled spine must be contiguous"
    finally:
        register_tables(spark, SF_SMALL, ("events",))  # restore the real view
