#!/usr/bin/env python
"""Per-batch flatness probe for the COMPOSED incremental-ingestion pipeline
(queries/pipeline.incremental_pipeline_batches, round 9): classifier gate ->
incremental exact dedup -> incremental near dedup -> incremental passage
scrub -> split assign, run as N sequential batches of the sf0.1 documents
table against fresh persistent stores.

The scale question is per-BATCH wall as ALL THREE stores (digest, band+
shingle, gram) grow: the chain adds no shuffle beyond its standalone stages,
so the curve should match the standalone probes' — flat early batches with
the slowly rising gram-store seen-join tail — and the composed cost should
be ~the sum of stage costs, not a blow-up. A superlinear tail here means a
stage's store join degenerates precisely when composed (e.g. a plan that
re-evaluates an upstream stage per downstream action).

Run:  python tools/pipeline_probe.py [n_batches]   # default 4
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators import dedup  # noqa: E402
from sql4pandas_spark.operators.sampling import split_assign  # noqa: E402
from sql4pandas_spark.operators.text import hashed_logistic_score  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1/documents.parquet"


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="s4ps-pipeline-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(BASE).select("doc_id", "text").repartition(8).cache()
    )
    docs.count()
    root = os.path.join(tempfile.gettempdir(), f"s4ps_pipe_probe_{uuid.uuid4().hex}")

    per_batch, survivors = [], []
    for k in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == k)
        t0 = time.perf_counter()
        scored = hashed_logistic_score(batch)
        gated = scored.filter(F.col("score") >= 0.5).select("doc_id", "text")
        kept = dedup.incremental_exact_dedup(
            gated, os.path.join(root, "exact"), batch_id=k
        )
        adm = dedup.incremental_near_dedup(kept, os.path.join(root, "near"))
        scrubbed = dedup.incremental_passage_scrub(
            adm, os.path.join(root, "grams"), min_tokens=50, batch_id=k
        )
        final = split_assign(
            scrubbed, "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05}
        )
        n = final.count()
        per_batch.append(round(time.perf_counter() - t0, 2))
        survivors.append(n)

    gram_rows = spark.read.parquet(os.path.join(root, "grams")).count()
    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_batches": n_batches,
                "batch_s": per_batch,
                "survivors": survivors,
                "gram_store_rows_final": gram_rows,
                "tail_over_first": round(per_batch[-1] / per_batch[0], 2)
                if per_batch[0]
                else None,
            }
        )
    )


if __name__ == "__main__":
    raise SystemExit(main())
