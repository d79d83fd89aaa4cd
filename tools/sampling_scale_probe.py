#!/usr/bin/env python
"""Quota-sampling scaling probe: two-phase quota_sample vs the naive
window-over-everything plan, at Nx the sf0.1 documents table.

The claim under test (operators/sampling.py): with a handful of strata,
ranking EVERY row in a window partitioned by the stratum concentrates the
whole input into |strata| tasks — the skew wall — while the two-phase plan
(map-side hash pre-filter, then rank ~safety x quota survivors) keeps the
rank shuffle O(strata x quota) no matter how big the input gets. If the
two-phase advantage does NOT grow with the replication factor, the
pre-filter isn't buying anything and the operator is complexity for show.

Replicas shift doc_id into disjoint ranges (hash inputs stay unique) and
keep the lang stratum, so stratum cardinality stays 5 while rows scale Nx.

Run:  python tools/sampling_scale_probe.py [factor ...]   # default: 100 1000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators.sampling import quota_sample  # noqa: E402
from sql4pandas_spark.operators.text import portable_hash60  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1/documents.parquet"
QUOTA = 60


def replicated(spark, factor: int):
    """Nx the corpus as ONE plan node (crossJoin against range(factor), ids
    shifted into disjoint ranges) — a factor-way union would cost
    O(factor) in Catalyst planning and task launches and the probe would
    measure scheduling, not the operators."""
    docs = spark.read.parquet(BASE).select("doc_id", "lang")
    span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    return (
        docs.crossJoin(spark.range(factor).select(F.col("id").alias("_rep")))
        .select(
            (F.col("doc_id") + F.col("_rep") * F.lit(span)).alias("doc_id"),
            "lang",
        )
        .repartition(32)
    )


def naive_quota(df):
    """The plan quota_sample exists to avoid: rank everything."""
    h = portable_hash60(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= QUOTA)
        .drop("_rn")
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [100, 1000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for f in factors:
        df = replicated(spark, f).persist()
        n = df.count()  # materialize input so timing excludes replica build
        # warm both plans once so codegen/exchange setup isn't in the timing
        quota_sample(df, "lang", QUOTA).count()
        naive_quota(df).count()

        t0 = time.monotonic()
        kept2 = quota_sample(df, "lang", QUOTA).count()
        two_phase = time.monotonic() - t0

        t0 = time.monotonic()
        kept1 = naive_quota(df).count()
        naive = time.monotonic() - t0

        # rows each plan feeds its rank shuffle — the scale-portable signal:
        # wall time on local[32] reads the cache for free, a cluster pays
        # disk+network per shuffled row
        h = portable_hash60(F.col("doc_id").cast("string")).cast("double")
        m = 2.0 * QUOTA + 16 + 4 * (2.0 * QUOTA) ** 0.5
        cutoff = m / (n / 5) * float(1 << 60)
        survivors = df.filter(h < cutoff).count()
        df.unpersist()

        assert kept1 == kept2 == 5 * QUOTA, (kept1, kept2)
        rows.append(
            {
                "factor": f,
                "rows": n,
                "two_phase_s": round(two_phase, 2),
                "naive_s": round(naive, 2),
                "shuffled_rows_two_phase": survivors,
                "shuffled_rows_naive": n,
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"probe": "quota_sample_scale", "rows": rows}))


if __name__ == "__main__":
    main()
