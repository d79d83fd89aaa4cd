#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "suite_warm_total", "value": <sec>, "unit": "sec",
   "queries": {...per-query warm sec...}, "sf": <sf>}

Methodology (round 8): one shared SparkSession (startup amortized, not
billed to queries) and one shared DuckDB connection; per query, one warmup
run on each engine, then THREE INTERLEAVED alternations
(spark, duckdb, spark, duckdb, spark, duckdb). Host drift moves both
engines of an alternation together, so the per-alternation spark/duckdb
ratio is the drift-stable signal — and three alternations measure the
ratio's spread within the run instead of arguing about it after the fact
(BASELINE.md documented +/-30% host noise from round-over-round absolute
seconds; the spread field now quantifies it per run). The reported
per-query time is the MEDIAN of the three warm Spark runs (robust to a
one-off scheduler stall; medians of warm runs match the old
"second-run-warm" methodology within noise). The query set is exactly
BASELINE.md's table: every catalog entry tagged "bench" (q1, q3, q5,
window_top3, events_hourly, json_props_avg, cosine_top20_pairs), so the
driver's BENCH_r{N}.json stays apples-to-apples with the measured
DuckDB/Spark baseline numbers.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql4pandas_spark.queries import load_catalog  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402
from sql4pandas_spark.sources.parquet import TABLES  # noqa: E402

ALTERNATIONS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    catalog = load_catalog()
    bench_set = {n: s for n, s in catalog.items() if "bench" in s.tags}
    # Tier-C heavy entries (tag "bench-heavy") run with the same
    # interleaved methodology but report in a SEPARATE tier_c section:
    # the headline suite_warm_total stays apples-to-apples with
    # BASELINE.md's 7-query table, while the heavy operator (the class
    # the round-10 band-join fix lives in) gets a per-round ratio row
    # regression-guarding it in the BENCH artifact instead of prose.
    heavy_set = {n: s for n, s in catalog.items() if "bench-heavy" in s.tags}

    spark = get_spark(app_name="s4ps-bench")
    spark.sparkContext.setLogLevel("ERROR")

    con = None
    try:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
    except Exception:  # control is best-effort; never fail the bench line
        con = None

    def measure(spec) -> tuple[float, float | None, dict[str, float] | None]:
        """Median warm Spark sec, median warm DuckDB sec, ratio stats —
        one warmup each, then ALTERNATIONS interleaved (spark, duck)
        pairs so host drift moves both engines of a pair together."""

        def run_spark() -> float:
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).collect()  # full materialization
            return time.perf_counter() - t0

        def run_duck() -> float | None:
            if con is None or spec.oracle is None:
                return None
            try:
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                return time.perf_counter() - t0
            except Exception:
                # control stays best-effort PER QUERY: one failing oracle
                # (version-missing function, heavy-oracle OOM) must cost
                # only its own ratio entry, never the whole bench line
                return None

        run_spark(), run_duck()  # warmups (codegen/JIT; fixtures page-cached)
        # keep (spark, duck) PAIRED per alternation: if a DuckDB run fails
        # mid-sequence, dropping the pair (not just the duck sample) keeps
        # each ratio computed from the same alternation's two runs
        pairs: list[tuple[float, float | None]] = []
        for _ in range(ALTERNATIONS):
            pairs.append((run_spark(), run_duck()))
        s_med = round(statistics.median([s for s, _ in pairs]), 3)
        d_runs = [d for _, d in pairs if d is not None]
        if not d_runs:
            return s_med, None, None
        ratios = [s / d for s, d in pairs if d is not None]
        mean = statistics.mean(ratios)
        return s_med, round(statistics.median(d_runs), 3), {
            "mean": round(mean, 3),
            # relative spread: (max-min)/mean — the per-run drift band
            "spread": round((max(ratios) - min(ratios)) / mean, 3),
        }

    times: dict[str, float] = {}
    duck_times: dict[str, float] = {}
    ratio_stats: dict[str, dict[str, float]] = {}
    for name, spec in sorted(bench_set.items()):
        s_med, d_med, rstats = measure(spec)
        times[name] = s_med
        if d_med is not None:
            duck_times[name] = d_med
            ratio_stats[name] = rstats

    tier_c: dict[str, dict] = {}
    for name, spec in sorted(heavy_set.items()):
        s_med, d_med, rstats = measure(spec)
        tier_c[name] = {"spark_sec": s_med, "duckdb_sec": d_med}
        if rstats is not None:
            tier_c[name]["ratio"] = rstats

    if con is not None:
        con.close()
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
                "methodology": f"median-of-{ALTERNATIONS}-interleaved",
                "duckdb_queries": duck_times,
                "duckdb_warm_total": duck_total,
                "spark_vs_duckdb_ratio": (
                    round(spark_oracled / duck_total, 3) if duck_total else None
                ),
                "per_query_ratio": ratio_stats,
                "ratio_skipped_queries": sorted(set(times) - set(duck_times)),
                "tier_c": tier_c,
            }
        )
    )


if __name__ == "__main__":
    main()
