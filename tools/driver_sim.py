#!/usr/bin/env python
"""Driver-session fidelity check: run catalog entries on a STOCK SparkSession.

The correctness driver builds its own SparkSession with none of this
engine's confs pre-applied; every catalog builder must self-configure
(session.configure_session) or it errs in the driver even though
tools/rehearse_driver_gate.py (which uses our pinned get_spark) passes.
This script reproduces the driver's setup exactly: stock session, entries
called through the __spark_entry__ contract.

Run:  python tools/driver_sim.py [N]     # N = how many entries (default 50,
                                         # the driver's verification window;
                                         # 0 = the whole catalog)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    queries = list(entrymod.queries().items())
    if n:
        queries = queries[:n]
    sf = os.environ.get("S4PS_REHEARSE_SF_DIR", "/root/testdata/sf0.01")
    bad: list[tuple[str, str]] = []
    for name, build in queries:
        try:
            build(spark, sf).count()
        except Exception as ex:  # noqa: BLE001 - report, don't abort
            bad.append((name, f"{type(ex).__name__}: {str(ex)[:160]}"))
    print(f"stock-session run of {len(queries)} entries: {len(bad)} failed")
    for name, err in bad:
        print(f"  {name}: {err}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
