#!/usr/bin/env python
"""Measure the PSL mega-regex's cost as the suffix snapshot grows.

registered_domain compiles PUBLIC_SUFFIXES_MULTI into alternation
regexes inside regexp_extract/rlike; the round-13 verdict flagged that
the "refresh is a constant swap, same plan" claim is only true up to
JVM regex-size limits and asked for a measured curve BEFORE the
snapshot grows (today ~230 alternations; the full PSL is ~9k rules).

This probe times the SAME six-arm extraction shape at synthetic
snapshot sizes n = 230 / 1k / 3k / 6k / 9k over the sf0.01 documents
table (planted URL column, identical row count per run) and prints one
JSON line per n: analysis+codegen ("first_s", a fresh literal plan each
time, never cached) and a second identical-action run ("warm_s").
The decision rule recorded in BASELINE.md: if first_s bends
super-linearly or the JVM rejects the pattern, registered_domain's
snapshot arm switches to the broadcast suffix-candidate join
strip_boilerplate already documents as its swap-in.

Run:  python tools/psl_scale_probe.py            (sf0.01)
      S4PS_PSL_PROBE_SF_DIR=... python tools/psl_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.session import get_spark  # noqa: E402
from sql4pandas_spark.sources.parquet import register_tables  # noqa: E402


def synthetic_suffixes(n: int) -> list[str]:
    """n multi-label suffixes shaped like the real list: 2-label ccTLD
    registries plus a 3-label band every 10th entry (longest-match is
    part of the measured pattern)."""
    out = []
    for i in range(n):
        if i % 10 == 0:
            out.append(f"k{i}.s{i % 97}.t{i % 53}")
        else:
            out.append(f"s{i}.t{i % 211}")
    return out


def main() -> None:
    sf_dir = os.environ.get("S4PS_PSL_PROBE_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="s4ps-psl-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, sf_dir, ("documents",))
    urls = spark.sql(
        "SELECT doc_id, 'https://sub.site' || CAST(doc_id % 1000 AS STRING)"
        " || '.example.com/p' AS url FROM documents"
    )
    urls.count()  # scan warm
    for n in (230, 1000, 3000, 6000, 9000):
        alt = "|".join(s.replace(".", r"\.") for s in synthetic_suffixes(n))
        dom_re = rf"([^.]+\.(?:{alt}))$"
        pure_re = rf"^(?:{alt})$"
        host = F.lower(F.regexp_extract(F.trim(F.col("url")), r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?([^/?#:]+)", 1))
        expr = (
            F.when(host.rlike(pure_re), F.lit(None).cast("string"))
            .when(F.regexp_extract(host, dom_re, 1) != "", F.regexp_extract(host, dom_re, 1))
            .when(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1) != "",
                  F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))
        )
        try:
            t0 = time.time()
            df = urls.select(F.count(F.when(expr.isNotNull(), 1)).alias("n"))
            df.collect()
            first = time.time() - t0
            t0 = time.time()
            df.collect()
            warm = time.time() - t0
            print(json.dumps({"n_suffixes": n, "pattern_chars": len(dom_re),
                              "first_s": round(first, 3), "warm_s": round(warm, 3)}))
        except Exception as e:  # noqa: BLE001 — the JVM limit IS a result
            print(json.dumps({"n_suffixes": n, "pattern_chars": len(dom_re),
                              "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
