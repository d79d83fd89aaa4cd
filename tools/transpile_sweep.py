#!/usr/bin/env python
"""Catalog-wide statement-parity sweep through the SQL transpiler.

The reference's identity is "SQL strings in, frames out" (SURVEY.md §1.1).
`Engine.sql(dialect="duckdb")` proves that identity on two statements; this
sweep proves it at catalog width: every sql-oracled entry's OWN DuckDB
oracle text is run through ``transpile_duckdb`` on Spark and compared to
DuckDB's result with the driver-exact canonicalizer (row count, sorted
column names, order-insensitive stringified value hash). An entry whose
oracle uses a genuinely unshared construct goes on the explicit skip list
in SKIP_REASONS with its reason — the test fails if a skipped entry
silently starts passing (stale skip) or an unskipped entry stops matching.

Run standalone:  python tools/transpile_sweep.py          (sf0.001)
                 S4PS_SWEEP_SF_DIR=/root/testdata/sf0.01 python tools/transpile_sweep.py
The pytest gate (tests/test_transpile_parity.py) runs the same sweep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: entry -> reason its oracle text cannot (or must not) run verbatim on
#: Spark. Kept small and explicit; every reason names the unshared
#: construct. The parity test asserts these entries really DO fail, so a
#: transpiler improvement that makes one pass forces the list to shrink.
#: Every skip fails LOUDLY in Catalyst's parser/analyzer or in the
#: transpiler itself — none is a silent value divergence (the sweep ended
#: round 11 at 0 MISMATCH).
SKIP_REASONS: dict[str, str] = {
    # EMPTY since round-14 session 3 — every oracled statement in the
    # catalog executes verbatim on Spark with a matching value hash. The
    # three historical skip classes were each retired by a structural
    # front-end feature: WITH RECURSIVE … UNION (10 entries) → the
    # semi-naive fixpoint executor (plans/recursive.py); ASOF JOIN syntax
    # (5 entries) → the decorrelated LATERAL rewrite (_rewrite_asof_join);
    # scalar subqueries inside higher-order-function lambdas (4 entries) →
    # the 1-row CROSS JOIN hoist (_hoist_hof_scalar_subqueries).
}


def canon_hash(rows: list[tuple], cols: list[str]) -> str:
    import hashlib

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(str(r[i]) for i in idx) for r in rows)
    return hashlib.md5(str(canon).encode()).hexdigest()


def run_sweep(
    spark, con, sf_dir: str, names: list[str] | None = None
) -> dict[str, tuple[str, str]]:
    """entry -> (status, detail); status in {MATCH, MISMATCH, ERROR}.

    MISMATCH = both engines executed but rows/cols/hash diverged (a silent
    semantic difference — the dangerous class); ERROR = Spark could not
    parse/analyze/execute the transpiled text (the loud class).
    """
    from sql4pandas_spark.functions.transpile import transpile_duckdb
    from sql4pandas_spark.plans.recursive import run_recursive_sql
    from sql4pandas_spark.queries.catalog import load_catalog
    from sql4pandas_spark.sources.parquet import register_tables

    register_tables(spark, sf_dir)
    cat = load_catalog()
    out: dict[str, tuple[str, str]] = {}
    for name, spec in cat.items():
        if spec.oracle is None or (names is not None and name not in names):
            continue
        res = con.execute(spec.oracle)
        orows, ocols = res.fetchall(), [d[0] for d in res.description]
        try:
            sdf = run_recursive_sql(spark, transpile_duckdb(spec.oracle))
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:  # noqa: BLE001 - classify, don't abort
            out[name] = ("ERROR", " ".join(str(ex).split())[:200])
            continue
        if len(srows) != len(orows):
            out[name] = ("MISMATCH", f"rowcount {len(srows)} vs {len(orows)}")
        elif sorted(scols) != sorted(ocols):
            out[name] = (
                "MISMATCH",
                f"cols {sorted(scols)[:6]} vs {sorted(ocols)[:6]}",
            )
        elif canon_hash(srows, scols) != canon_hash(orows, ocols):
            out[name] = ("MISMATCH", "value-hash")
        else:
            out[name] = ("MATCH", "")
    return out


def main() -> int:
    import duckdb

    from sql4pandas_spark.session import get_spark
    from sql4pandas_spark.sources.parquet import TABLES

    sf = os.environ.get("S4PS_SWEEP_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="s4ps-transpile-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    t0 = time.time()
    results = run_sweep(spark, con, sf)
    n = {"MATCH": 0, "MISMATCH": 0, "ERROR": 0}
    for name, (status, detail) in results.items():
        n[status] += 1
        if status != "MATCH":
            skip = "  [skip-listed]" if name in SKIP_REASONS else ""
            print(f"{status:9s} {name}: {detail}{skip}")
    stale = [s for s in SKIP_REASONS if results.get(s, ("", ""))[0] == "MATCH"]
    for s in stale:
        print(f"STALE-SKIP {s}: now matches — remove from SKIP_REASONS")
    print(
        f"{time.time() - t0:.0f}s: {n['MATCH']} MATCH / {n['MISMATCH']} "
        f"MISMATCH / {n['ERROR']} ERROR over {sum(n.values())} oracled "
        f"entries ({len(SKIP_REASONS)} skip-listed)"
    )
    unexplained = [
        name
        for name, (status, _) in results.items()
        if status != "MATCH" and name not in SKIP_REASONS
    ]
    return 1 if unexplained or stale else 0


if __name__ == "__main__":
    raise SystemExit(main())
