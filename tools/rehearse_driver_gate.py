#!/usr/bin/env python
"""Rehearse the driver's t2 correctness gate exactly: run every
__spark_entry__.queries() entry at sf0.01 and compare to oracle_sql() in
DuckDB by row count, sorted column names, and order-insensitive STRINGIFIED
value hash — the same stringent comparison the driver applies.

This intentionally does NOT reuse the pytest comparator: pandas-level
normalization (tests/conftest.py) can mask type-rendering divergence that a
string hash sees (e.g. DuckDB date_trunc('month') returns DATE where Spark
returns TIMESTAMP — caught by this script, invisible to toPandas compare).

Run before every round handoff:  python tools/rehearse_driver_gate.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402
from sql4pandas_spark.sources.parquet import TABLES  # noqa: E402


#: (entry, sf basename) pairs where a 0-row result is legitimate AT THAT
#: scale factor: TPC-H Q11's keep-threshold is a FIXED fraction of the
#: national total, so as SF grows each part's share shrinks and the
#: result empties — both engines agree. The entry is non-empty at sf0.01
#: (the scale the driver gate actually hashes), so an sf0.01 rehearsal
#: that empties q11 is a REAL regression and is NOT exempted. Everything
#: else reporting 0 rows on both engines is flagged as a vacuous MATCH.
EMPTY_OK = {("q11_important_stock", "sf0.1")}


def canon_hash(rows: list[tuple], cols: list[str]) -> str:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(str(r[i]) for i in idx) for r in rows)
    return hashlib.md5(str(canon).encode()).hexdigest()


def nonscalar_cols(schema) -> list[str]:
    """Columns whose type the DRIVER's canonicalizer cannot hash.

    The driver converts results to pandas and sort_values over every
    column; Array/Map/Struct cells arrive as numpy.ndarray / dict / Row
    — unhashable, so the whole comparison crashes with err (this is
    exactly how random_projection_embeddings and lexicon_tags_documents
    went red in round 9 while this rehearsal's str() hashing sailed
    through). Reject such schemas HERE, before the stringified compare
    can mask them.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


#: DuckDB types whose pandas rendering diverges from their fetchall
#: rendering: HUGEINT (DuckDB silently promotes sum() of BIGINT) becomes
#: float64 in the driver's pandas canonicalizer, so a value that
#: stringifies '123' here stringifies '123.0' there — the same
#: rehearsal/driver divergence class as the round-9 array crash, caught
#: structurally instead of by luck. Fix the oracle with an explicit
#: CAST(... AS BIGINT). DECIMAL is deliberately NOT flagged: it renders
#: float64 too, which MATCHES a Spark double column's rendering (the
#: incr_quantile est_value columns are DECIMAL(24,1) and have a
#: committed driver green).
PANDAS_DIVERGENT_DUCKDB_TYPES = ("HUGEINT", "UHUGEINT")


def divergent_oracle_cols(con, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs whose pandas rendering would diverge —
    via DESCRIBE, so nothing is executed."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        (name, typ)
        for name, typ, *_ in rows
        if any(t in typ.upper() for t in PANDAS_DIVERGENT_DUCKDB_TYPES)
    ]


def main() -> int:
    sf = os.environ.get("S4PS_REHEARSE_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="s4ps-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    # S4PS_REHEARSE_ONLY=a,b,c rehearses just the named entries (fast
    # inner-loop check after touching a specific query); looked up in the
    # FULL catalog, before any limit, and unknown names fail loudly.
    only = os.environ.get("S4PS_REHEARSE_ONLY", "")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            print(f"S4PS_REHEARSE_ONLY names unknown queries: {unknown}")
            return 1
        queries = {n: queries[n] for n in names}
    # S4PS_REHEARSE_LIMIT=50 rehearses exactly the driver's verification
    # window (the first 50 iteration-order entries) with per-query timing.
    limit = int(os.environ.get("S4PS_REHEARSE_LIMIT", "0"))
    if limit:
        queries = dict(list(queries.items())[:limit])
    bad: list[tuple[str, str]] = []
    #: entry -> {"spark_s": …, "duckdb_s": …} — written as a committed
    #: per-round artifact (ENTRY_TIMINGS_r{N}.json) when
    #: S4PS_REHEARSE_TIMINGS_OUT is set, so per-OPERATOR wall-time drift
    #: is visible round-over-round the way BENCH_r{N}.json makes the
    #: 7-query suite drift visible. Spark time covers build+collect (plan
    #: + execution, the user-visible cost); DuckDB time covers the oracle
    #: execute+fetch on the same host, the per-entry noise control.
    timings: dict[str, dict[str, float]] = {}
    n_sql = n_rows = 0
    t0 = time.time()
    for name, build in queries.items():
        tq = time.time()
        try:
            sdf = build(spark, sf)
            ns = nonscalar_cols(sdf.schema)
            if ns:
                bad.append((name, f"non-scalar result columns {ns} (driver-unhashable)"))
                continue
            srows = [tuple(r) for r in sdf.collect()]
            timings[name] = {"spark_s": round(time.time() - tq, 3)}
            if name in oracles:
                div = divergent_oracle_cols(con, oracles[name])
                if div:
                    bad.append(
                        (name, f"oracle columns {div} render differently in "
                               "pandas (driver) than fetchall (here) — add CASTs")
                    )
                    continue
                td = time.time()
                res = con.execute(oracles[name])
                orows = res.fetchall()
                timings[name]["duckdb_s"] = round(time.time() - td, 3)
                ocols = [d[0] for d in res.description]
                if (
                    len(srows) == 0
                    and len(orows) == 0
                    and (name, os.path.basename(sf.rstrip("/"))) not in EMPTY_OK
                ):
                    # 0 == 0 with equal hashes proves nothing — the
                    # round-13 corpus_assembly gate emptied its corpus
                    # and sailed through as a vacuous MATCH
                    bad.append((name, "0-row result on BOTH engines — vacuous MATCH"))
                elif len(srows) != len(orows):
                    bad.append((name, f"rowcount {len(srows)} vs {len(orows)}"))
                elif sorted(sdf.columns) != sorted(ocols):
                    bad.append((name, f"cols {sorted(sdf.columns)} vs {sorted(ocols)}"))
                elif canon_hash(srows, sdf.columns) != canon_hash(orows, ocols):
                    bad.append((name, "value-hash mismatch"))
                else:
                    n_sql += 1
            elif not srows:
                bad.append((name, "empty rows-only result"))
            else:
                n_rows += 1
        except Exception as ex:  # noqa: BLE001 - report, don't abort the sweep
            bad.append((name, f"ERROR {str(ex)[:120]}"))
        if os.environ.get("S4PS_REHEARSE_TIMES"):
            print(f"  {time.time() - tq:6.1f}s {name}", flush=True)

    out_path = os.environ.get("S4PS_REHEARSE_TIMINGS_OUT", "")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {"sf_dir": sf, "entries": dict(sorted(timings.items()))},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {len(timings)} entry timings to {out_path}")

    n_entry = len(entrymod.entry(spark).collect())
    print(
        f"{time.time() - t0:.0f}s: {n_sql} oracle MATCH, {n_rows} rows-only OK, "
        f"entry()={n_entry} rows, {len(bad)} problems"
    )
    for name, msg in bad:
        print(f"  {name} -> {msg}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
