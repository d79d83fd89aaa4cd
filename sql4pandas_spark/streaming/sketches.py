"""Streaming sketch-state maintenance — a raw stream continuously folded
into a bounded MERGEABLE state (SURVEY.md §2 incr_heavy_hitters /
incr_quantile, streaming form).

The streaming sibling of streaming/cdc.py, for the read-side incremental
family (operators/sketches.py): ``readStream`` over a landing directory →
``foreachBatch`` → per-batch state (heavy-hitter candidates, fixed-grid
histogram) merged into a VERSIONED parquet store. The same versioning
makes it exactly-once without an ACID format — and exactly-once is
LOAD-BEARING here, more than for CDC: merge_heavy_hitter_states /
merge_histograms ADD counts, so a replayed batch that re-merged would
double-count (the merge_agg_states idempotence warning,
operators/maintenance.py). The version chain turns at-least-once delivery
into exactly-once application:

- micro-batch ``k`` reads state ``v{k}`` and OVERWRITES ``v{k+1}`` —
  never the directory it is reading;
- after a crash, foreachBatch re-delivers the last uncommitted batch with
  the SAME batch_id, which rewrites the same ``v{k+1}`` from the same
  (unchanged) ``v{k}`` — byte-identical, no double count;
- retained versions double as sketch time travel: ``v{k}`` answers
  "what were the top tokens / p99 as of batch k".

Scale shape: each micro-batch does one map-side-combined aggregate over
its OWN rows (the per-batch state), then merges against a state of
bounded size — ≤ batches × m rows for heavy hitters (re-truncate
periodically), exactly ≤ n_bins rows for histograms — so the per-batch
cost is O(batch) + O(|state|) regardless of how many billions of raw rows
the state summarizes. The raw stream is never re-scanned.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The version-directory mechanics are shared with the CDC store — one
# implementation of "what is the latest committed v{k}" for both write-side
# (snapshot) and read-side (sketch state) incremental maintenance.
from sql4pandas_spark.streaming.cdc import (
    _versions,
    latest_snapshot,
    require_replay_source,
)

#: read the highest committed state version (alias: the store layout is
#: identical to the CDC snapshot store).
latest_state = latest_snapshot

MergeFn = Callable[[DataFrame, DataFrame], DataFrame]
BatchStateFn = Callable[[DataFrame], DataFrame]


def seed_state(state: DataFrame, store_root: str) -> str:
    """Write the initial sketch state as version 0 (usually empty:
    ``spark.createDataFrame([], schema)`` — the merge functions treat an
    empty side as the identity)."""
    dst = os.path.join(store_root, "v0")
    state.write.mode("overwrite").parquet(dst)
    return dst


def empty_state(spark: SparkSession, schema: str, store_root: str) -> str:
    """Seed version 0 with an empty state of the given DDL schema."""
    return seed_state(spark.createDataFrame([], schema), store_root)


def sketch_apply_batch(
    batch_state: DataFrame,
    store_root: str,
    merge_fn: MergeFn,
    batch_id: int,
) -> str:
    """Merge ONE micro-batch's state: ``v{batch_id}`` ∪ batch-state →
    ``v{batch_id + 1}``. Replay-idempotent by construction (same input
    version, same batch rows, overwrite write). Returns the new version
    path.

    Same checkpoint/version alignment guard as cdc_apply_batch: a drain
    restarted with a FRESH checkpoint renumbers batches from 0, which
    would re-merge history onto stale ``v0`` — for additive sketch
    states that silently double-counts, so misalignment raises instead.
    Legal inputs: batch_id == latest (advance) or latest - 1 (crash
    replay of the last uncommitted batch).
    """
    spark = batch_state.sparkSession
    vs = _versions(store_root)
    if not vs:
        raise FileNotFoundError(
            f"no state versions under {store_root}; seed_state first"
        )
    latest = vs[-1]
    if batch_id not in (latest, latest - 1):
        raise RuntimeError(
            f"sketch checkpoint/version misalignment: batch_id={batch_id} "
            f"but latest committed version is v{latest} (expected "
            f"{latest} to advance or {latest - 1} to replay). Additive "
            f"states double-count under renumbered replay — reuse the "
            f"original checkpoint directory, or reseed the store root."
        )
    require_replay_source(store_root, batch_id, vs)
    src = os.path.join(store_root, f"v{batch_id}")
    dst = os.path.join(store_root, f"v{batch_id + 1}")
    prev = spark.read.parquet(src)
    post = merge_fn(prev, batch_state)
    post.write.mode("overwrite").parquet(dst)
    return dst


def run_sketch_stream(
    stream: DataFrame,
    store_root: str,
    batch_state_fn: BatchStateFn,
    merge_fn: MergeFn,
    checkpoint: str | None = None,
    timeout_sec: int = 120,
) -> str:
    """Drain a raw stream into the versioned sketch store with
    ``trigger(availableNow=True)``. Reusing the same ``checkpoint``
    across calls resumes batch numbering where the last drain stopped —
    the periodic-ingest production shape the version chain relies on.
    Returns the checkpoint path for the next drain."""
    ckpt = checkpoint or tempfile.mkdtemp(prefix="s4ps_sketch_ckpt_")

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        sketch_apply_batch(batch_state_fn(df), store_root, merge_fn, batch_id)

    from sql4pandas_spark.streaming.windows import pinned_stream_width

    with pinned_stream_width(stream.sparkSession):
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:  # pragma: no cover - defensive stop on hang
            q.stop()
    return ckpt


# -- concrete sketches -------------------------------------------------------


def run_heavy_hitter_stream(
    stream: DataFrame,
    store_root: str,
    item_col: str,
    m: int = 64,
    checkpoint: str | None = None,
    timeout_sec: int = 120,
) -> str:
    """Maintain a streaming heavy-hitters candidate state: each
    micro-batch contributes its exact top-``m`` item counts
    (operators/sketches.heavy_hitter_state), merged by per-item addition
    (merge_heavy_hitter_states). Accuracy contract inherited from the
    batch form: per-batch distinct items ≤ m ⇒ the maintained state is
    EXACT; otherwise an item can only be undercounted by batches where
    it missed that batch's top-m, never inflated."""
    from sql4pandas_spark.operators.sketches import (
        heavy_hitter_state,
        merge_heavy_hitter_states,
    )

    return run_sketch_stream(
        stream,
        store_root,
        lambda df: heavy_hitter_state(df, item_col, m),
        merge_heavy_hitter_states,
        checkpoint=checkpoint,
        timeout_sec=timeout_sec,
    )


def run_cms_stream(
    stream: DataFrame,
    store_root: str,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    checkpoint: str | None = None,
    timeout_sec: int = 120,
) -> str:
    """Maintain a streaming count-min sketch: each micro-batch contributes
    its cell counts (operators/sketches.count_min_state), merged by
    per-cell addition (merge_cms_states) — point-frequency estimates for
    ANY item stay answerable in O(depth) from a ≤ depth·width-row state
    (cms_lookup), with the never-undercount contract intact because
    per-cell sums of batch counts equal the global cell counts. The
    (depth, width, seed) grid is FIXED at stream start, like the
    histogram grid."""
    from sql4pandas_spark.operators.sketches import (
        count_min_state,
        merge_cms_states,
    )

    return run_sketch_stream(
        stream,
        store_root,
        lambda df: count_min_state(df, item_col, depth, width),
        merge_cms_states,
        checkpoint=checkpoint,
        timeout_sec=timeout_sec,
    )


def run_histogram_stream(
    stream: DataFrame,
    store_root: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    checkpoint: str | None = None,
    timeout_sec: int = 120,
) -> str:
    """Maintain a streaming fixed-grid histogram state: each micro-batch
    bins its own rows (operators/sketches.value_histogram), merged by
    per-bin addition (merge_histograms). The [lo, hi, n_bins] grid is
    FIXED at stream start — the mergeability precondition. Percentile
    read-outs come off the latest state via quantiles_from_histogram,
    exact to one bin width, without ever re-scanning raw history."""
    from sql4pandas_spark.operators.sketches import (
        merge_histograms,
        value_histogram,
    )

    return run_sketch_stream(
        stream,
        store_root,
        lambda df: value_histogram(df, value_col, lo, hi, n_bins),
        merge_histograms,
        checkpoint=checkpoint,
        timeout_sec=timeout_sec,
    )


def run_dsir_stats_stream(
    stream: DataFrame,
    store_root: str,
    is_target,
    checkpoint: str | None = None,
) -> str:
    """Fold a DOCUMENT stream into the versioned DSIR bucket-counter
    store: per micro-batch the state contribution is
    ``dsir_bucket_stats(dsir_bucket_tokens(batch))`` — a |buckets|-row
    integer counter frame — and the merge is per-bucket addition, the
    same counter algebra `operators/sampling.merge_dsir_stats` applies
    across batches. Exactly-once versioning is load-bearing here for
    the same reason as the count-min grid: counters double-count under
    renumbered replay. The read-out (`dsir_terms` → `dsir_score`) never
    re-scans ingested history; ``is_target`` is the unbound boolean
    Column defining the target slice (e.g. ``F.col("lang") == "en"``)."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sampling import (
        dsir_bucket_stats,
        dsir_bucket_tokens,
    )

    def batch_state(df: DataFrame) -> DataFrame:
        return dsir_bucket_stats(dsir_bucket_tokens(df, is_target))

    def merge(prev: DataFrame, cur: DataFrame) -> DataFrame:
        return (
            prev.unionByName(cur)
            .groupBy("_b")
            .agg(
                F.sum("_t_cnt").alias("_t_cnt"),
                F.sum("_r_cnt").alias("_r_cnt"),
            )
        )

    return run_sketch_stream(stream, store_root, batch_state, merge, checkpoint)
