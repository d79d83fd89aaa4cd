#!/usr/bin/env python
"""Hot-gram skew probe for duplicate_passage_spans (round 8).

The operator's docstring claims the gram-keyed window stays LINEAR under a
hot gram (a boilerplate passage shared by very many docs): the window
partition holds (id, pos, 8B) rows only, so even a 100k-site gram is a few
MB of sortable rows — unlike ngram_jaccard's pair self-join, which goes
quadratic in a hot shingle's doc count. This probe measures that claim:
every synthesized doc is a unique 2-token prefix plus the SAME 30-token
boilerplate, so each in-boilerplate 20-gram has exactly N sites — the
worst skew the operator can see. Linear wall-time growth N -> 10N (and a
span count equal to N) passes; superlinear growth means the window is
degenerating.

Run: python tools/passage_skew_probe.py [N ...]   # default: 10000 100000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators.dedup import duplicate_passage_spans  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402

BOILER = " ".join(f"hot{i:02d}" for i in range(30))
L = 20


def make_docs(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("p"),
            F.col("id").cast("string"),
            F.lit(" q"),
            F.col("id").cast("string"),
            F.lit(" " + BOILER),
        ).alias("text"),
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    spark = get_spark(app_name="s4ps-passage-skew")
    spark.sparkContext.setLogLevel("ERROR")
    report = {"boiler_tokens": 30, "min_tokens": L, "sizes": {}}
    for n in sizes:
        docs = make_docs(spark, n).cache()
        docs.count()
        best = spans = None
        for _ in range(2):
            t0 = time.perf_counter()
            spans = duplicate_passage_spans(docs, min_tokens=L).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        docs.unpersist()
        # every doc contributes exactly one span (its boilerplate copy),
        # and each in-boiler gram has n sites — the hot partition size
        report["sizes"][str(n)] = {
            "spans": int(spans),
            "sites_per_hot_gram": n,
            "wall_s": round(best, 3),
        }
    ks = sorted(report["sizes"], key=int)
    if len(ks) >= 2:
        a, b = report["sizes"][ks[0]], report["sizes"][ks[-1]]
        report["time_ratio"] = round(b["wall_s"] / a["wall_s"], 2)
        report["data_ratio"] = round(int(ks[-1]) / int(ks[0]), 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
