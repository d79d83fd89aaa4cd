#!/usr/bin/env python
"""Interval-overlap join fan-out probe (round 8).

``operators/joins.interval_overlap_join`` documents that intervals longer
than ``max_interval_seconds`` (the bucket width W) stay CORRECT but fan out
across more buckets — a performance bound, not a correctness one
(joins.py:276-281). This probe measures that claim instead of arguing it:

- synthesize N deterministic intervals per side over a fixed 30-day
  horizon, with lengths = ratio x W for ratio in RATIOS (0.5 = honest
  sizing, 4 / 16 = callers who under-sized W by that factor);
- for each ratio: the exploded bucket-row count (expected ~ N x (ratio+1)),
  the output pair count, and the join wall time;
- at small N, verify the bucketed join's pair count equals the naive
  theta-join (BNL) reference — correctness under fan-out, not just speed.

The scaling claim passes if time grows ~linearly in (exploded rows +
output pairs) — i.e. fan-out costs what the extra bucket rows cost, with
no quadratic cliff. Output pair counts themselves grow with ratio because
longer intervals genuinely overlap more — that's the workload, not the
operator.

Run: python tools/interval_probe.py [N]   (default 10000 per side)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators.joins import interval_overlap_join  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402

W = 3600  # bucket width = declared max interval length (1h)
HORIZON = 30 * 24 * 3600  # 30 days of start times
RATIOS = (0.5, 4, 16)  # interval length as a multiple of W
VERIFY_N = 1500  # theta-join reference size (BNL is O(n*m))


def make_intervals(spark, n: int, ratio: float, side: str):
    """n deterministic intervals: start = hash-jittered over the horizon,
    length = ratio*W with +/-25% hash jitter. Pure column expressions so
    the probe data never materializes on the driver."""
    base = int(ratio * W)
    df = spark.range(n).select(
        F.col("id").alias(f"{side}_id"),
        F.timestamp_seconds(
            F.lit(1_600_000_000)
            + F.pmod(F.xxhash64(F.col("id"), F.lit(side)), F.lit(HORIZON))
        ).alias("start_ts"),
    )
    jitter = F.pmod(F.xxhash64(F.col(f"{side}_id"), F.lit(side + "len")), F.lit(max(base // 2, 1))) - F.lit(max(base // 4, 1))
    return df.select(
        f"{side}_id",
        "start_ts",
        F.timestamp_seconds(
            F.unix_timestamp("start_ts") + F.lit(base) + jitter
        ).alias("end_ts"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark(app_name="s4ps-interval-probe")
    spark.sparkContext.setLogLevel("ERROR")
    report = {"n_per_side": n, "bucket_w": W, "ratios": {}}

    for ratio in RATIOS:
        left = make_intervals(spark, n, ratio, "l").cache()
        right = make_intervals(spark, n, ratio, "r").cache()
        left.count(), right.count()  # materialize inputs outside the timing

        def nbuckets(df, s, e):
            return df.select(
                F.sum(
                    F.floor(F.unix_timestamp(F.col(e)) / W)
                    - F.floor(F.unix_timestamp(F.col(s)) / W)
                    + 1
                )
            ).collect()[0][0]

        exploded = nbuckets(left, "start_ts", "end_ts") + nbuckets(
            right, "start_ts", "end_ts"
        )
        joined = interval_overlap_join(
            left, right, "start_ts", "end_ts", "start_ts", "end_ts", W
        )
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = joined.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)

        # correctness under fan-out: bucketed == naive theta join (small N)
        sl = make_intervals(spark, VERIFY_N, ratio, "l")
        sr = make_intervals(spark, VERIFY_N, ratio, "r")
        got = interval_overlap_join(
            sl, sr, "start_ts", "end_ts", "start_ts", "end_ts", W
        ).count()
        want = (
            sl.alias("a")
            .join(
                sr.alias("b"),
                (F.col("a.start_ts") <= F.col("b.end_ts"))
                & (F.col("b.start_ts") <= F.col("a.end_ts")),
            )
            .count()
        )
        report["ratios"][str(ratio)] = {
            "exploded_rows": int(exploded),
            "pairs": int(pairs),
            "join_s": round(best, 3),
            "verify_bucketed": int(got),
            "verify_theta": int(want),
            "verify_ok": got == want,
        }
        left.unpersist(), right.unpersist()

    print(json.dumps(report))


if __name__ == "__main__":
    main()
