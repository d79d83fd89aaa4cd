"""Failure-mode contract of incremental_exact_dedup's digest store.

Three properties the happy-path differential can't see:

1. **Crash-replay idempotency** (at-least-once foreachBatch): a batch
   re-run with the same batch_id — after its store write already committed
   but before the downstream sink did — must reproduce exactly its original
   kept set, and the store must never double-count a digest.
2. **Corrupt store raises** — a broken store read must NOT be treated as
   "first batch" (that would silently disable cross-batch dedup); only a
   genuinely missing path may.
3. **NULL-text contract** — NULL texts dedup against each other across
   batches instead of slipping through a never-matching NULL join key.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sql4pandas_spark.operators.dedup import incremental_exact_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _kept_ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def _store_digests(spark, store):
    return [r.content_hash for r in spark.read.parquet(store).collect()]


def test_replayed_batch_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "digests")
    b1 = _docs(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    b2 = _docs(spark, [(10, "beta"), (11, "gamma"), (12, "gamma")])

    kept1 = _kept_ids(incremental_exact_dedup(b1, store, batch_id=0))
    assert kept1 == [1, 2]  # smallest id per content, within-batch dup dropped

    kept2 = _kept_ids(incremental_exact_dedup(b2, store, batch_id=1))
    assert kept2 == [11]  # beta seen in batch 0; gamma kept once
    digests_after = sorted(_store_digests(spark, store))

    # crash AFTER batch 1's store write committed, BEFORE the sink commit:
    # foreachBatch re-delivers batch_id=1 — output and store must not change
    for _ in range(2):
        replay = _kept_ids(incremental_exact_dedup(b2, store, batch_id=1))
        assert replay == kept2
        replayed_digests = sorted(_store_digests(spark, store))
        assert replayed_digests == digests_after
        assert len(replayed_digests) == len(set(replayed_digests)), (
            "store double-counted a digest on replay"
        )


def test_replay_with_new_content_converges(spark, tmp_path):
    """Replay where the batch carries content the ORIGINAL run also wrote:
    dynamic partition overwrite replaces the batch's partition wholesale, so
    even a half-committed original write converges to the full digest set."""
    store = str(tmp_path / "digests")
    incremental_exact_dedup(_docs(spark, [(1, "a")]), store, batch_id=0)
    b1 = _docs(spark, [(2, "b"), (3, "c")])
    incremental_exact_dedup(b1, store, batch_id=1)
    # simulate the replayed batch after a clean write: same result, and the
    # batch_id=1 partition holds exactly b/c once
    incremental_exact_dedup(b1, store, batch_id=1)
    per_batch = (
        spark.read.parquet(store)
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {r.batch_id: r.n for r in per_batch}
    assert counts == {0: 1, 1: 2}


def test_corrupt_store_raises_instead_of_readmitting(spark, tmp_path):
    from pyspark.errors import AnalysisException

    store = str(tmp_path / "digests")
    os.makedirs(store)
    with open(os.path.join(store, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not parquet")
    with pytest.raises(Exception) as ei:
        incremental_exact_dedup(_docs(spark, [(1, "a")]), store).collect()
    # anything but the silent first-batch fallback; PATH_NOT_FOUND must not
    # be the swallowed condition here
    if isinstance(ei.value, AnalysisException):
        cond = (
            ei.value.getCondition()
            if hasattr(ei.value, "getCondition")
            else ei.value.getErrorClass()
        )
        assert cond != "PATH_NOT_FOUND"


def test_missing_store_is_first_batch(spark, tmp_path):
    store = str(tmp_path / "nonexistent" / "digests")
    kept = _kept_ids(incremental_exact_dedup(_docs(spark, [(5, "x")]), store))
    assert kept == [5]
    assert len(_store_digests(spark, store)) == 1


def test_null_text_rows_dedup_across_batches(spark, tmp_path):
    store = str(tmp_path / "digests")
    b1 = _docs(spark, [(1, None), (2, "real")])
    b2 = _docs(spark, [(10, None), (11, None), (12, "other")])
    assert _kept_ids(incremental_exact_dedup(b1, store, batch_id=0)) == [1, 2]
    # every later NULL text is a duplicate of batch 0's NULL row
    assert _kept_ids(incremental_exact_dedup(b2, store, batch_id=1)) == [12]


# --------------------------------------------------- near-dedup store (r7)


def test_near_store_corrupt_bands_raise(spark, tmp_path):
    """Same contract as the digest store: a broken bands read must raise
    the corrupt-parquet error itself, not be swallowed as 'store missing'
    (which would silently disable cross-batch near-dedup)."""
    from sql4pandas_spark.operators.dedup import incremental_near_dedup

    store = str(tmp_path / "near_store")
    bands = os.path.join(store, "bands")
    os.makedirs(bands)
    with open(os.path.join(bands, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    b = _docs(spark, [(1, "some words here for a doc " * 3)])
    with pytest.raises(Exception) as ei:
        incremental_near_dedup(b, store).collect()
    # The failure must stem from the unreadable parquet footer (Spark 4
    # error class FAILED_READ_FILE.CANNOT_READ_FILE_FOOTER), proving the
    # store read reached the corrupt file and propagated its error.
    msg = str(ei.value)
    assert "CANNOT_READ_FILE_FOOTER" in msg or "not a Parquet file" in msg


def test_near_dedup_composes_with_foreach_batch_stream(spark, tmp_path):
    """Streaming integration: drain a 2-file stream through foreachBatch
    calling incremental_near_dedup per micro-batch — the production
    continuous-ingestion shape. File 2 repeats file 1's content near-
    identically; only file 1's docs (and file 2's novel doc) land in the
    sink."""
    import os as _os

    from sql4pandas_spark.operators.dedup import incremental_near_dedup

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    t2 = "completely different content stream two " * 4
    files = [
        [(1, t1)],
        [(10, t1 + " tail"), (11, t2)],  # 10 ~ admitted 1 → rejected
    ]
    src = tmp_path / "src"
    flat = tmp_path / "flat"
    os.makedirs(flat)
    for i, rows in enumerate(files):
        d = str(src / f"f{i}")
        _docs(spark, rows).coalesce(1).write.parquet(d)
        for f in sorted(_os.listdir(d)):
            if f.endswith(".parquet"):
                _os.symlink(_os.path.join(d, f), str(flat / f"{i:02d}_{f}"))

    store = str(tmp_path / "near_store")
    sink = str(tmp_path / "sink")

    def write_batch(df, batch_id):
        kept = incremental_near_dedup(df, store)
        kept.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(sink)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    assert got == [1, 11], got


def test_empty_first_batch_does_not_poison_exact_store(spark, tmp_path):
    """A zero-row batch must not create a footerless store dir: the next
    batch's read would fail UNABLE_TO_INFER_SCHEMA instead of seeing an
    empty store (round-8 property-differential find, fixed by skipping
    empty writes — an absent partition is replay-equivalent to empty)."""
    store = str(tmp_path / "digests")
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert _kept_ids(incremental_exact_dedup(empty, store, batch_id=0)) == []
    b = _docs(spark, [(1, "real content"), (2, "real content")])
    assert _kept_ids(incremental_exact_dedup(b, store, batch_id=1)) == [1]


def test_gramless_first_batch_does_not_poison_passage_store(spark, tmp_path):
    from sql4pandas_spark.operators.dedup import incremental_passage_scrub

    store = str(tmp_path / "grams")
    short = _docs(spark, [(1, "too short")])  # < min_tokens -> zero grams
    incremental_passage_scrub(short, store, min_tokens=8, batch_id=0).collect()
    boiler = " ".join(f"pz{i}" for i in range(10))
    b1 = _docs(spark, [(2, "first copy " + boiler)])
    b2 = _docs(spark, [(3, boiler + " later copy")])
    incremental_passage_scrub(b1, store, min_tokens=8, batch_id=1).collect()
    out = {
        r.doc_id: r.text
        for r in incremental_passage_scrub(
            b2, store, min_tokens=8, batch_id=2
        ).collect()
    }
    assert out[3] == "later copy"


def test_empty_first_batch_does_not_poison_near_store(spark, tmp_path):
    from sql4pandas_spark.operators.dedup import incremental_near_dedup

    store = str(tmp_path / "near")
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_near_dedup(empty, store).count() == 0
    b = _docs(spark, [(1, "some words repeated here for a doc " * 3)])
    assert _kept_ids(incremental_near_dedup(b, store)) == [1]
