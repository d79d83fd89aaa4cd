"""Table-maintenance operators: small-file compaction.

The small-files problem is the classic failure mode of long-running ingest
at scale: thousands of KB-sized parquet files per partition turn every scan
into a file-listing + task-scheduling storm (one task per file) and crush
the NameNode/object-store listing path. The fix is a periodic compaction
job: rewrite a directory into ceil(rows / target) evenly-sized files.

Reference parity: the reference engine (in-memory pandas, SURVEY.md §1.1)
has no table maintenance at all — this operator exists because the 100 TB
deployment target demands it (SURVEY.md §2.9), not because the reference
had one.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


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
