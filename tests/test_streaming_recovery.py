"""Checkpoint-recovery semantics: a streaming query killed mid-drain resumes
from its checkpoint and processes the remaining input exactly once.

This is the fault-tolerance half of the §2.10 batch-equivalence contract:
run_available_now proves a clean drain equals the batch result; this test
proves the recovery path — commit batch 0, crash before batch 1 writes,
restart on the SAME checkpoint — re-reads nothing already committed and
still converges to the exact batch answer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def two_file_stream_dir(spark, tmp_path):
    """events.parquet split into two files so maxFilesPerTrigger=1 yields two
    deterministic micro-batches."""
    src = str(tmp_path / "landing")
    events = spark.read.parquet(f"{SF}/events.parquet")
    half = events.count() // 2
    events.filter(F.col("event_id") < half).coalesce(1).write.parquet(
        os.path.join(src, "f0")
    )
    events.filter(F.col("event_id") >= half).coalesce(1).write.parquet(
        os.path.join(src, "f1")
    )
    # the file source watches one flat directory of part files
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for sub in ("f0", "f1"):
        for f in sorted(os.listdir(os.path.join(src, sub))):
            if f.endswith(".parquet"):
                os.symlink(
                    os.path.join(src, sub, f), os.path.join(flat, f"{n}.parquet")
                )
                n += 1
    assert n == 2
    return flat


def test_stream_resumes_from_checkpoint_exactly_once(
    spark, tmp_path, two_file_stream_dir
):
    batch_schema = spark.read.parquet(f"{SF}/events.parquet").schema
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def make_stream():
        return (
            spark.readStream.schema(batch_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(two_file_stream_dir)
            .select("event_id", "event_type", "value")
        )

    class Poison(Exception):
        pass

    def poisoned_write(df, batch_id):
        if batch_id >= 1:
            raise Poison("injected crash before batch 1 commits")
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    q = (
        make_stream()
        .writeStream.foreachBatch(poisoned_write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
        q.processAllAvailable()  # pragma: no cover - raises above first
    assert not q.isActive

    # batch 0 committed, batch 1 never wrote
    interim = spark.read.parquet(out)
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert 0 < interim.count() < total

    def clean_write(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    q2 = (
        make_stream()
        .writeStream.foreachBatch(clean_write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    final = spark.read.parquet(out)
    # exactly once: every event exactly one row, nothing re-written, and the
    # restarted query continued the batch numbering from the checkpoint
    assert final.count() == total
    assert final.select("event_id").distinct().count() == total
    assert final.select("batch_id").distinct().count() == 2


@pytest.mark.parametrize("exactly_once,expect_dups", [(True, False), (False, True)])
def test_crash_after_write_before_commit(
    spark, tmp_path, two_file_stream_dir, exactly_once, expect_dups
):
    """The failure mode the clean-crash test above can't see: the batch's
    parquet WRITE lands, then the process dies BEFORE the checkpoint
    commit. foreachBatch re-delivers that batch on restart, so a plain
    append duplicates it (at-least-once, pinned here as expect_dups=True),
    while the exactly-once writer overwrites its own batch_id partition
    and converges to exactly one copy of every event."""
    from sql4pandas_spark.streaming.windows import parquet_batch_writer

    batch_schema = spark.read.parquet(f"{SF}/events.parquet").schema
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def make_stream():
        return (
            spark.readStream.schema(batch_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(two_file_stream_dir)
            .select("event_id", "event_type", "value")
        )

    inner = parquet_batch_writer(out, exactly_once=exactly_once)

    def write_then_crash(df, batch_id):
        inner(df, batch_id)  # the write COMMITS to the sink...
        if batch_id >= 1:
            raise RuntimeError("injected crash after write, before commit")

    q = (
        make_stream()
        .writeStream.foreachBatch(write_then_crash)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
        q.processAllAvailable()  # pragma: no cover - raises above first
    assert not q.isActive

    total = spark.read.parquet(f"{SF}/events.parquet").count()
    # batch 1's data is already on disk despite the uncommitted checkpoint
    assert spark.read.parquet(out).count() == total

    q2 = (
        make_stream()
        .writeStream.foreachBatch(inner)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    final = spark.read.parquet(out)
    assert final.select("event_id").distinct().count() == total
    if expect_dups:
        assert final.count() > total, (
            "append mode should have duplicated the replayed batch — if "
            "this starts passing, foreachBatch semantics changed"
        )
    else:
        assert final.count() == total


# ------------------------------------------------------- streaming CDC apply


def _seed_kv(spark, root):
    from sql4pandas_spark.streaming import cdc

    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    cdc.seed_snapshot(snap, root)
    return snap


def test_cdc_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch re-delivers the last uncommitted batch after a crash
    with the SAME batch_id; cdc_apply_batch must rewrite the same version
    from the same input — byte-identical post-state, prior versions
    untouched."""
    from sql4pandas_spark.streaming import cdc

    root = str(tmp_path / "snap")
    _seed_kv(spark, root)
    changes = spark.createDataFrame(
        [(2, "b", 99, "update"), (3, None, 0, "delete"), (4, "d", 40, "insert")],
        "k long, s string, v long, op string",
    )
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=0)
    first = sorted(tuple(r) for r in spark.read.parquet(root + "/v1").collect())
    # simulated crash-replay: same batch_id, same changes
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=0)
    again = sorted(tuple(r) for r in spark.read.parquet(root + "/v1").collect())
    assert first == again == [(1, "a", 10), (2, "b", 99), (4, "d", 40)]
    # v0 untouched by either application
    v0 = sorted(tuple(r) for r in spark.read.parquet(root + "/v0").collect())
    assert v0 == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_cdc_stream_resumes_checkpoint_and_chains_versions(spark, tmp_path):
    """Two availableNow drains over one landing dir + one checkpoint: the
    second drain picks up ONLY the newly-landed file and continues the
    version chain (v0 -> v1 -> v2), with latest_snapshot reading v2."""
    from sql4pandas_spark.streaming import cdc

    root = str(tmp_path / "snap")
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)
    _seed_kv(spark, root)

    def land_file(rows, name):
        df = spark.createDataFrame(rows, "k long, s string, v long, op string")
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.parquet(stage)
        (part,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        os.rename(os.path.join(stage, part), os.path.join(land, name))
        return df

    schema = "k long, s string, v long, op string"
    b1 = [(1, "a", 11, "update"), (4, "d", 40, "insert")]
    b2 = [(2, None, 0, "delete"), (4, "d", 44, "update"), (9, "x", 0, "delete")]
    land_file(b1, "c0.parquet")
    stream = spark.readStream.schema(schema).parquet(land)
    cdc.run_cdc_stream(stream, root, ["k"], checkpoint=ckpt)
    v_after_1 = sorted(os.listdir(root))
    assert v_after_1 == ["v0", "v1"]

    land_file(b2, "c1.parquet")
    stream = spark.readStream.schema(schema).parquet(land)
    cdc.run_cdc_stream(stream, root, ["k"], checkpoint=ckpt)
    assert sorted(os.listdir(root)) == ["v0", "v1", "v2"]

    final = sorted(tuple(r) for r in cdc.latest_snapshot(spark, root).collect())
    # 1 updated in b1; 2 deleted in b2; 3 untouched; 4 inserted then
    # updated; 9 delete-of-missing no-ops
    assert final == [(1, "a", 11), (3, "c", 30), (4, "d", 44)]


def test_cdc_seq_col_picks_last_change_per_key(spark, tmp_path):
    """A batch carrying several changes for one key applies only the
    highest-seq change (CDC LSN semantics)."""
    from sql4pandas_spark.streaming import cdc

    root = str(tmp_path / "snap")
    _seed_kv(spark, root)
    changes = spark.createDataFrame(
        [
            (2, "b", 50, "update", 1),
            (2, "b", 60, "update", 2),
            (2, None, 0, "delete", 3),
            (3, "c", 31, "update", 7),
        ],
        "k long, s string, v long, op string, seq long",
    )
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=0, seq_col="seq")
    post = sorted(tuple(r) for r in spark.read.parquet(root + "/v1").collect())
    assert post == [(1, "a", 10), (3, "c", 31)]  # key 2's final change = delete


def test_cdc_latest_snapshot_requires_a_version(spark, tmp_path):
    from sql4pandas_spark.streaming import cdc

    with pytest.raises(FileNotFoundError):
        cdc.latest_snapshot(spark, str(tmp_path / "nowhere"))
