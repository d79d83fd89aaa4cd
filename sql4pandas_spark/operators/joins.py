"""Join strategies beyond what a single `df.join` spells: skew salting and
bucketed co-located joins (SURVEY.md §4.2 — the two knobs that matter when
AQE's automatic handling isn't enough at 100 TB).
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: spread each hot key of the BIG side over
    `n_salts` shuffle partitions; replicate the SMALL side once per salt.

    Each big row gets a deterministic salt from the hash of its full row
    content (same content → same salt; a hot key's rows still spread because
    their non-key columns differ), and the small side is exploded
    `n_salts`× so every (key, salt) pair finds its match. The result is
    row-for-row identical to the plain join — asserted in
    tests/test_joins.py — but the shuffle for a key holding p% of the rows
    now peaks at p/n_salts per task. AQE's skew-join split handles most of
    this automatically; explicit salting is for the cases AQE can't see
    (first shuffle of a stage, or skew inside a single huge key).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = b.join(
        s,
        (F.col(big_key) == F.col(small_key)) & (b["_salt"] == s["_salt"]),
        how,
    )
    return joined.drop("_salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """Persist `df` hash-bucketed (and per-bucket sorted) on `key`.

    Joining two tables bucketed identically on their join keys needs NO
    exchange — each task reads matching bucket files from both sides. This
    is the pre-shuffle-once, join-many-times pattern for the fact tables of
    a 100 TB warehouse (the cluster-scale equivalent of an index).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A previous SESSION may have left files at the managed location without
    # a catalog entry (the in-memory catalog dies with the session) —
    # saveAsTable refuses that with LOCATION_ALREADY_EXISTS, so clear it.
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    leftover = os.path.join(warehouse.path or warehouse.netloc, table)
    shutil.rmtree(leftover, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
