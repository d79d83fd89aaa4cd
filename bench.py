#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "suite_warm_total", "value": <sec>, "unit": "sec",
   "queries": {...per-query warm sec...}, "sf": <sf>}

Methodology matches BASELINE.md: one shared SparkSession (startup amortized,
not billed to queries), each query run twice, the SECOND (warm) time reported
— warm-vs-cold is JIT/codegen, not I/O (the fixtures fit in page cache).
The query set is exactly BASELINE.md's table: every catalog entry tagged
"bench" (q1, q3, q5, window_top3, events_hourly, json_props_avg,
cosine_top20_pairs) so the driver's BENCH_r{N}.json is apples-to-apples with
the measured DuckDB/Spark baseline numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql4pandas_spark.queries import load_catalog  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    catalog = load_catalog()
    bench_set = {n: s for n, s in catalog.items() if "bench" in s.tags}

    spark = get_spark(app_name="s4ps-bench")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    for name, spec in sorted(bench_set.items()):
        warm = None
        for _run in range(2):
            t0 = time.perf_counter()
            df = spec.build(spark, sf_dir)
            rows = df.collect()  # full materialization, like the oracle's fetch
            warm = time.perf_counter() - t0
        assert rows is not None
        times[name] = round(warm, 3)

    print(
        json.dumps(
            {
                "metric": "suite_warm_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
