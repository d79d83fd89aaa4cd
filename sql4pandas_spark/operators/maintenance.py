"""Table-maintenance operators: small-file compaction and range clustering.

The small-files problem is the classic failure mode of long-running ingest
at scale: thousands of KB-sized parquet files per partition turn every scan
into a file-listing + task-scheduling storm (one task per file) and crush
the NameNode/object-store listing path. The fix is a periodic compaction
job: rewrite a directory into ceil(rows / target) evenly-sized files.

Range clustering is compaction's data-skipping sibling: sort the rewrite on
the columns queries filter by, so each parquet row group's min/max
statistics cover a NARROW value range and a selective predicate prunes most
row groups at scan time (the engine already pushes the filter down; whether
the pushed filter can skip anything is a pure layout property). This is the
single-dimension form of Z-ordering — the right tool when one column
dominates the filter workload.

Reference parity: the reference engine (in-memory pandas, SURVEY.md §1.1)
has no table maintenance at all — these operators exist because the 100 TB
deployment target demands them (SURVEY.md §2.9), not because the reference
had them.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Rewrite a parquet directory into evenly-sized files.

    - File count = ``ceil(rows / target_records_per_file)`` via round-robin
      ``repartition(n)`` — a shuffle, deliberately: ``coalesce`` would avoid
      it but inherits the input's skew, and a compaction job's whole point
      is even output files. The count() that sizes the job is
      parquet-metadata-only (no data read).
    - Values are untouched — the compaction oracle is "every aggregate is
      identical before and after" (see ``compact_documents_files``).
    - At 100 TB this runs per-partition (``WHERE`` on the partition column,
      one compaction job per partition directory) so the shuffle is bounded
      by a partition's size, not the table's.

    Returns the compacted DataFrame (lazy, reads ``dst``).
    """
    df = spark.read.parquet(src)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_records_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)


def cluster_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    cluster_cols: list[str],
    target_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Rewrite a parquet directory range-clustered on ``cluster_cols``.

    ``repartitionByRange`` gives each output file a disjoint value range of
    the leading cluster column (sampled range boundaries — one shuffle),
    and ``sortWithinPartitions`` orders rows inside each file so every
    parquet ROW GROUP's min/max footer statistics span a narrow slice.
    A pushed-down predicate on the cluster column then skips whole files
    (via file-level stats) and whole row groups (via footer stats) instead
    of decoding them — at 100 TB this is the difference between a scan
    touching ~selectivity of the bytes and touching all of them. Values
    are untouched; the correctness oracle is aggregate-identity, the
    layout property is asserted directly on the parquet footers in
    tests/test_maintenance.py.

    One dimension only (the leading column dominates). For multi-column
    point lookups an interleaved (Z-order/Hilbert) key would be the next
    step — out of contract scope, documented for the 100 TB reader.
    """
    df = spark.read.parquet(src)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_records_per_file))
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(dst)
    )
    return spark.read.parquet(dst)


def zorder_key(
    quantized: list[Column], bits_per_col: int = 16
) -> Column:
    """Interleave the low ``bits_per_col`` bits of pre-quantized long
    columns into one Z-value (Morton code): bit b of column c lands at
    position ``b * n_cols + c``. Pure JVM expression (shiftleft/and/or
    terms, whole-stage-codegen-friendly) — no UDF.
    """
    n = len(quantized)
    if n * bits_per_col > 63:
        raise ValueError(
            f"{n} columns x {bits_per_col} bits = {n * bits_per_col} bits "
            "does not fit a signed long (max 63): the top bit would flip "
            "the sign and Java masks shift amounts mod 64, silently "
            f"corrupting the ordering — use bits_per_col<={63 // n}"
        )
    terms = [
        F.shiftleft(
            F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + c
        )
        for b in range(bits_per_col)
        for c, q in enumerate(quantized)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    cluster_cols: list[str],
    target_records_per_file: int = 1_000_000,
    bits_per_col: int = 16,
) -> DataFrame:
    """Rewrite a parquet directory Z-ORDERED on several columns.

    Single-column range clustering (:func:`cluster_parquet_dir`) makes one
    dimension's row-group stats tight and leaves the others full-width; a
    Morton interleave gives EVERY listed column ~N^(-1/d) row-group
    coverage, so selective predicates on ANY of the d columns (or several
    at once) skip most row groups. This is how table formats implement
    ``OPTIMIZE ... ZORDER BY``; here it is plain parquet + a sort key.

    Values are min/max linear-quantized to ``bits_per_col`` bits (a
    2-value agg per column — one metadata-cheap pass), interleaved with
    :func:`zorder_key`, then the rewrite range-partitions and sorts on the
    Z-value and drops it. Lossless (aggregate-identity oracle); the
    per-dimension footer-stats property is asserted in
    tests/test_maintenance.py.
    """
    df = spark.read.parquet(src)
    # ONE pre-write scan: row count (sizes the job) and per-column bounds
    # (quantization) in the same aggregate — a second full pass purely for
    # count() would double the read cost at the 100 TB target
    stats = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.min(c).alias(f"mn_{c}") for c in cluster_cols],
        *[F.max(c).alias(f"mx_{c}") for c in cluster_cols],
    ).collect()[0]
    n_rows = stats["n_rows"]
    if n_rows == 0:  # empty source: an empty (lossless) rewrite
        df.write.mode("overwrite").parquet(dst)
        return spark.read.parquet(dst)
    n_files = max(1, math.ceil(n_rows / target_records_per_file))
    top = (1 << bits_per_col) - 1
    quantized = []
    for c in cluster_cols:
        if stats[f"mn_{c}"] is None:
            raise ValueError(
                f"cluster column {c!r} is entirely NULL — it carries no "
                "ordering information; drop it from cluster_cols"
            )
        mn = float(stats[f"mn_{c}"])
        span = float(stats[f"mx_{c}"]) - mn
        frac = (F.col(c).cast("double") - F.lit(mn)) / F.lit(span or 1.0)
        quantized.append(
            # NULL rows quantize to bucket 0 (co-located at the low end,
            # not silently mixed into the max bucket as least() would do)
            F.when(F.col(c).isNull(), F.lit(0)).otherwise(
                F.least(
                    F.lit(top),
                    F.floor(frac * F.lit(float(top + 1))).cast("long"),
                )
            )
        )
    z = df.withColumn("_z", zorder_key(quantized, bits_per_col))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(dst)
    )
    return spark.read.parquet(dst)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots: one row per key present in
    either side, with ``status`` in {added, removed, changed, unchanged} —
    the "what changed between yesterday's and today's load" audit every
    batch pipeline eventually needs (regression gates on upstream refeeds,
    CDC validation, idempotence checks).

    Scale shape: ONE full-outer join keyed by ``key_cols`` (narrow keys);
    change detection is NULL-safe column equality evaluated row-local.
    At 100 TB with very wide rows, pre-digest the compared columns to one
    xxhash64 per side so the join carries (key, 8-byte digest) instead of
    every column — same status semantics, documented trade: a digest
    collision (~2^-64) would mask a change. Keys must be unique per side
    (it is a SNAPSHOT diff; feed deduped tables).

    ``compare_cols=None`` (default) compares every shared non-key column;
    an explicit ``[]`` requests a keys-only presence diff (statuses are
    then added/removed/unchanged only).
    """
    if compare_cols is None:
        compare_cols = [
            c
            for c in new.columns
            if c in set(old.columns) and c not in set(key_cols)
        ]
    o = old.select(
        *[F.col(c) for c in key_cols],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    nw = new.select(
        *[F.col(c) for c in key_cols],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
            for c in compare_cols
        ],
        F.lit(True),
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(nw, key_cols, "full_outer").select(
        *key_cols, status.alias("status")
    )


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Keyed row-level MERGE (CDC apply) — the write-side dual of
    :func:`snapshot_diff`: apply an insert/update/delete changeset to a
    keyed snapshot and return the post-state. Ops: ``delete`` removes the
    key; anything else upserts (update-on-missing-key inserts, insert-on-
    present-key replaces — the tolerant CDC semantics that make REPLAYING
    a changeset idempotent, which is what turns at-least-once delivery
    into exactly-once application).

    ``seq_col`` (a change-sequence / LSN column) picks the LAST change per
    key when a batch carries several; equal-seq ties (same-transaction
    LSNs) break deterministically by (op, data columns) lexicographically
    — an arbitrary row_number tie would make the post-state partition-
    order dependent and break replay idempotence. Without ``seq_col`` the
    changeset must be key-unique (one change per key — the caller's
    contract, as a global uniqueness probe would cost a full shuffle at
    100 TB). A NULL ``op`` upserts (CDC feeds often omit op for plain
    inserts) — only an explicit ``delete`` removes.

    Scale shape: one left-anti join of the snapshot against the change
    keys plus one union — both keyed by the narrow key columns. A CDC
    batch is normally orders smaller than the snapshot, so AQE broadcasts
    the key side and the snapshot never shuffles; the rewrite is then a
    scan + map. Pair with dynamic partition overwrite (partition_upsert)
    to rewrite only affected partitions instead of the whole table.
    """
    data_cols = [c for c in snapshot.columns if c not in set(key_cols)]
    latest = changes
    if seq_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(),
            F.lower(F.col(op_col)),
            *[F.col(c).cast("string") for c in data_cols],
        )
        latest = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    # eqNullSafe: a NULL op must UPSERT per the documented contract — a
    # bare != would evaluate NULL and silently drop the row from the
    # upsert side while its key is still anti-joined away (NULL-op rows
    # would act as deletes)
    upserts = latest.filter(
        ~F.lower(F.col(op_col)).eqNullSafe("delete")
    ).select(*key_cols, *data_cols)
    kept = snapshot.join(latest.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(upserts)


#: Merge functions for distributive aggregate states. ``count`` is merged
#: as a SUM of partial counts (the classic count-combine identity); avg and
#: stddev are ALGEBRAIC — derive them from (count, sum, sum-of-squares)
#: after the merge, never store them in the state (merged averages of
#: averages are wrong under unequal batch sizes).
AGG_STATE_MERGE = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}


def partial_agg_state(
    df: DataFrame, key_cols: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate one raw batch into a per-key partial state.

    ``measures`` maps state-column name -> (kind, source-expression), kind
    in {sum, count, min, max}. Sums over floats must be pre-quantized to
    integers by the caller (the repo-wide order-independent-summation
    convention) so that merge order can never change the state.
    """
    aggs = []
    for name, (kind, src) in measures.items():
        col = F.expr(src)
        fn = F.count if kind == "count" else AGG_STATE_MERGE[kind]
        aggs.append(fn(col).alias(name))
    return df.groupBy(*key_cols).agg(*aggs)


def merge_agg_states(
    state: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    merges: dict[str, str],
) -> DataFrame:
    """Incremental aggregate maintenance — fold a new batch's partial
    aggregate state into a persisted per-key state WITHOUT rescanning any
    raw history (the materialized-view delta-maintenance primitive, the
    read-side dual of merge_upsert's row-level CDC apply).

    ``merges`` maps state column -> merge kind: ``sum``/``count`` partials
    add, ``min``/``max`` partials take the extremum — the distributive
    aggregates, whose partial states combine losslessly. Algebraic
    aggregates (avg, stddev) are DERIVED from distributive state columns
    after the final merge; holistic ones (exact median/distinct) have no
    mergeable state and need the sketch path (HLL/quantile-digest,
    operators/sketches.py).

    Scale shape: ``unionByName`` + one ``groupBy(key)`` over NARROW
    state rows (|state-keys| + |batch-partial-keys|; partial_agg_state
    has already map-side-combined the raw batch), never the raw history.
    Because both union children arrive hash-partitioned on the key
    (partial_agg_state's own groupBy leaves them so; bucketed state
    storage preserves it on disk), Catalyst plans the merge aggregate
    with ZERO additional exchanges — pinned in
    tests/test_round9_ops.py::test_merge_adds_zero_exchanges… This is
    Spark's own partial-aggregation combine re-applied across batches:
    each refresh costs O(|keys|) map-side work regardless of how many
    billions of raw rows the state summarizes; re-deriving the same
    state from raw would be a full-history scan per refresh.

    Idempotence warning: unlike merge_upsert, re-applying the SAME batch
    double-counts (sum/count states are not idempotent under replay) —
    exactly-once delivery is the caller's contract; under at-least-once
    streaming, stamp batches and dynamic-overwrite a batch-id partition
    (streaming/etl.py) before merging.
    """
    merged = state.unionByName(delta)
    aggs = [
        (F.sum if k in ("sum", "count") else AGG_STATE_MERGE[k])(c).alias(c)
        for c, k in merges.items()
    ]
    return merged.groupBy(*key_cols).agg(*aggs)


def extract_changeset(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """CDC changeset GENERATION — the inverse of :func:`merge_upsert`:
    diff two keyed snapshots into the minimal op-log that turns ``old``
    into ``new``. Output: key columns + ``new``'s data columns (NULL on
    deletes) + ``op`` in {insert, update, delete}; unchanged keys emit
    NOTHING (that's the "minimal": replaying a no-op log is free).
    Roundtrip law, pinned in tests:
    ``merge_upsert(old, extract_changeset(old, new), keys) == new``.

    This is how a batch-recomputed table ships to consumers as a
    changeset (backfill-diff publishing): downstream stores apply the
    small op-log instead of re-ingesting the full snapshot, and
    snapshot_diff's status counts become the publish audit.

    Scale shape: one full-outer SMJ on the narrow key columns — both
    sides exchange once, the value comparison is a null-safe conjunction
    evaluated in the join row (no second pass); output volume is the
    CHANGE volume, not the table volume.
    """
    data_cols = [c for c in new.columns if c not in set(key_cols)]
    if [c for c in old.columns if c not in set(key_cols)] != data_cols:
        raise ValueError("old/new must share the same data columns")
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_od_{c}") for c in data_cols],
    )
    nw = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_nd_{c}") for c in data_cols],
    )
    cond = [
        F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in key_cols
    ]
    j = o.join(nw, cond, "full_outer")
    same = F.lit(True)
    for c in data_cols:
        same = same & F.col(f"_od_{c}").eqNullSafe(F.col(f"_nd_{c}"))
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
                for c in key_cols
            ],
            *[F.col(f"_nd_{c}").alias(c) for c in data_cols],
            "op",
        )
    )


def scd2_history(
    changes: DataFrame, key_cols: list[str], seq_col: str
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history build: turn a versioned
    change log (one row per key per change, ordered by ``seq_col``) into
    validity intervals — each row gains ``valid_to_seq`` (the NEXT
    change's sequence, NULL while current) and ``is_current``. The
    warehouse-classic "as-of any version" layout: a point-in-time query
    is ``WHERE seq <= :v AND (valid_to_seq IS NULL OR valid_to_seq >
    :v)``, no log replay needed.

    ``(key, seq)`` must be unique (a change log's natural contract —
    merge_upsert's seq_col dedup produces exactly this); equal-seq
    duplicates would create zero-width intervals.

    Scale shape: ONE exchange on the key columns — the lead() window
    and the is_current flag share the same partitioning; no joins, no
    second pass. History tables dwarf their snapshots over time: pair
    with range clustering on (key, seq) (cluster_parquet_dir) so as-of
    scans prune to one row group per key.
    """
    w = Window.partitionBy(*key_cols).orderBy(seq_col)
    nxt = F.lead(seq_col).over(w)
    return changes.withColumn("valid_to_seq", nxt).withColumn(
        "is_current", F.col("valid_to_seq").isNull()
    )


def init_join_view(
    left: DataFrame, right: DataFrame, on: list[str]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Materialize an equi-join view V = left ⋈ right plus the two side
    snapshots it was built from — the starting state for
    :func:`refresh_join_view`. All three frames are localCheckpoint-ed:
    they are the maintained state, re-read every refresh."""
    view = left.join(right, on).localCheckpoint(eager=True)
    return (
        left.localCheckpoint(eager=True),
        right.localCheckpoint(eager=True),
        view,
    )


def refresh_join_view(
    state: tuple[DataFrame, DataFrame, DataFrame],
    on: list[str],
    delta_left: DataFrame | None = None,
    delta_right: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental maintenance of an equi-join materialized view under
    APPEND batches — the classic delta-join identity::

        ΔV = ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR
        V' = V ∪ ΔV,   L' = L ∪ ΔL,   R' = R ∪ ΔR

    The point at 100 TB: every term joins a BATCH-sized delta against a
    snapshot, so the deltas are explicitly ``broadcast()`` and the big
    snapshots never shuffle — a refresh costs O(|Δ| + matched rows), not
    a recompute of L ⋈ R (pytest plan-asserts the BroadcastHashJoin on
    every delta term). Append-only by design: deletes/updates belong to
    the keyed MERGE family (:func:`merge_upsert` + a view rebuild of the
    affected keys), not this identity — a delta with key overlap into
    existing rows would double-count, exactly as in any bag-semantics
    IVM. New view/snapshots are checkpointed; lineage stays flat across
    arbitrarily many refreshes."""
    left, right, view = state
    zero_l = delta_left is None
    zero_r = delta_right is None
    parts = []
    if not zero_l:
        parts.append(F.broadcast(delta_left).join(right, on))
    if not zero_r:
        parts.append(left.join(F.broadcast(delta_right), on))
    if not zero_l and not zero_r:
        parts.append(F.broadcast(delta_left).join(F.broadcast(delta_right), on))
    new_view = view
    for p in parts:
        new_view = new_view.unionByName(p)
    new_left = left if zero_l else left.unionByName(delta_left)
    new_right = right if zero_r else right.unionByName(delta_right)
    return (
        new_left.localCheckpoint(eager=True),
        new_right.localCheckpoint(eager=True),
        new_view.localCheckpoint(eager=True),
    )
