"""Compute-width spreading for CPU-dominated per-row stages.

A Spark scan's parallelism is bounded by parquet ROW GROUPS, not bytes:
a file written as one row group is one task no matter how
``spark.sql.files.maxPartitionBytes`` is tuned, and AQE's post-shuffle
coalesce collapses any small shuffle output to a handful of partitions.
Both are the right default for I/O-bound stages — and exactly wrong when
the next stage is per-row CPU that costs orders of magnitude more than
one exchange of the rows (MinHash signatures: n_hashes affine-min passes
over a shingle array per document; SimHash/winnowing: per-token hash
rolls; embedding block-matmuls). Profiled at sf0.1 (round 14): the
near-dedup signature stage ran as ONE task for ~1.6 s while 31 cores
idled, and AQE's concurrent stage materialization then raced EIGHT
duplicate computations of the same unmaterialized single-partition frame.

:func:`spread_for_compute` round-robin-repartitions the (already
projected) input to the session's shuffle width before such a stage.
The trade is deliberate and scales: the exchange moves each row once at
network/disk speed, while the guarded computation costs 10-100x that per
row at ANY scale — so the overhead stays a few percent on a 100 TB
corpus (where scans usually have natural parallelism anyway) and the win
is total whenever the input arrives serial (single-row-group files,
gzip, a coalesced upstream aggregate). Width follows
``spark.sql.shuffle.partitions`` — the same cluster-sized knob every
other exchange uses, not a local constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def compute_width(spark) -> int:
    """The session's shuffle width (falls back to 32 under non-numeric
    AQE spellings such as ``auto``)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:
        return 32


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle width, ahead of
    per-row work that dwarfs one exchange of the rows. Project the frame
    to the columns the computation needs BEFORE calling this — the
    exchange should carry only what the stage reads. Streaming frames
    pass through untouched (micro-batch sizing is the stream's own
    concern, and ``repartition`` barriers interact badly with
    watermarks).

    Inputs that already plan at >= the target width pass through too: a
    100 TB parquet scan has natural file-split parallelism, and paying a
    full exchange of (id, text) rows to "spread" it would be pure
    overhead — the spread exists for inputs that arrive SERIAL
    (single-row-group files, coalesced upstream aggregates). The probe
    reads the planned partition count off the physical RDD (no job runs;
    planning a fixture-sized frame is sub-millisecond) and falls back to
    spreading if the plan cannot be inspected."""
    if df.isStreaming:
        return df
    width = compute_width(df.sparkSession)
    try:
        if df.rdd.getNumPartitions() >= width:
            return df
    except Exception:  # pragma: no cover - planning probe is best-effort
        pass
    return df.repartition(width)
