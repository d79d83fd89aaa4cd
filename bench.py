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

The line also carries a same-host DuckDB control (each bench entry's oracle
SQL, warm second run) — host drift moves both engines together, so the
spark/duckdb ratio is the drift-stable signal for round-over-round
comparison (BASELINE.md:73-79); absolute seconds alone chase host noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql4pandas_spark.queries import load_catalog  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402
from sql4pandas_spark.sources.parquet import TABLES  # noqa: E402


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

    # DuckDB control: same queries (oracle form), same parquet, same host.
    duck_times: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name, spec in sorted(bench_set.items()):
            if spec.oracle is None:
                continue
            for _run in range(2):
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                duck_times[name] = round(time.perf_counter() - t0, 3)
        con.close()
    except Exception:  # control is best-effort; never fail the bench line
        duck_times = {}

    total = round(sum(times.values()), 3)
    duck_total = round(sum(duck_times.values()), 3) if duck_times else None
    # the ratio compares IDENTICAL query sets: spark time summed only over
    # entries the DuckDB side also ran (an oracle-less bench entry would
    # otherwise bias the numerator with no denominator term)
    spark_oracled = round(sum(times[n] for n in duck_times), 3)
    print(
        json.dumps(
            {
                "metric": "suite_warm_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "duckdb_queries": duck_times,
                "duckdb_warm_total": duck_total,
                "spark_vs_duckdb_ratio": (
                    round(spark_oracled / duck_total, 3) if duck_total else None
                ),
                "ratio_skipped_queries": sorted(set(times) - set(duck_times)),
            }
        )
    )


if __name__ == "__main__":
    main()
