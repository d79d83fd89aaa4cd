#!/usr/bin/env python
"""Dedup-operator scaling probe: MinHash-LSH and SimHash at Nx documents.

Why a separate probe: tools/scale_probe.py replicates documents with
IDENTICAL text (digest-shuffle stress, intended), but for near-dup
operators identical replicas are all mutual near-dups — candidate volume
then grows quadratically by data construction, not by operator behavior.
Here each replica i rewrites every token ``w -> w·xi`` so replica
namespaces are mutually DISSIMILAR: the corpus's internal near-dup
structure repeats once per replica, clusters scale Nx, and a well-bucketed
operator should scale ~linearly in rows. Superlinear growth here would
mean the banded self-join is degenerating (hot buckets), which is exactly
what the probe exists to catch before a 100 TB run does.

Run:  python tools/dedup_scale_probe.py [factor ...]   # default: 2 4
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators import dedup  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1/documents.parquet"


def build_perturbed(spark, out_path: str, factor: int) -> None:
    docs = spark.read.parquet(BASE).select("doc_id", "text")
    if os.path.exists(out_path):
        # reuse only when the cached replica matches the CURRENT base
        # fixture (row-count fingerprint) — stale /tmp data from an older
        # fixture round would silently corrupt the measurement
        expected = docs.count() * factor
        try:
            if spark.read.parquet(out_path).count() == expected:
                return
        except Exception:
            pass
    span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(factor):
        part = docs.select(
            (F.col("doc_id") + i * span).alias("doc_id"),
            # token-wise namespace rewrite: every word gets an xi suffix, so
            # replica i's shingles never collide with replica j's
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{i}").alias("text")
            if i
            else F.col("text"),
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(out_path)


def time_ops(spark, path: str) -> dict[str, float]:
    docs = spark.read.parquet(path)

    def minhash_pairs():
        sigs = dedup.minhash_signatures(docs)
        cands = dedup.lsh_candidate_pairs(sigs)
        return dedup.verified_near_pairs(sigs, cands).agg(
            F.count(F.lit(1)).alias("n_pairs"), F.min("id_a")
        )

    def simhash_pairs():
        return dedup.simhash_near_pairs(dedup.simhash(docs)).agg(
            F.count(F.lit(1)).alias("n_pairs"), F.min("id_a")
        )

    times: dict[str, float] = {}
    for name, build in (("minhash_pairs", minhash_pairs), ("simhash_pairs", simhash_pairs)):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            build().collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    return times


def time_incremental(spark, path: str, n_batches: int = 4) -> dict:
    """Ingest the corpus in n_batches sequential batches against a fresh
    store (tools-probe for operators/dedup.incremental_near_dedup). The
    scale question is per-BATCH cost as the store grows: with namespaced
    replicas, cross-batch candidates stay proportional to the batch (band
    buckets only collide within a namespace), so batch times should stay
    ~flat — a rising tail means the store join is degenerating."""
    import shutil
    import tempfile
    import uuid as _uuid

    docs = spark.read.parquet(path)
    store = os.path.join(
        tempfile.gettempdir(), f"s4ps_incr_near_probe_{_uuid.uuid4().hex}"
    )
    per_batch, admitted = [], []
    for b in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == b)
        t0 = time.perf_counter()
        n = dedup.incremental_near_dedup(batch, store).count()
        per_batch.append(round(time.perf_counter() - t0, 2))
        admitted.append(n)
    shutil.rmtree(store, ignore_errors=True)
    return {"batch_s": per_batch, "admitted": admitted}


def time_incremental_passage(spark, path: str, n_batches: int = 4) -> dict:
    """Round-8 sibling probe for operators/dedup.incremental_passage_scrub:
    same sequential-batch shape, fresh gram store. Namespaced replicas
    share no grams across namespaces, so cross-batch scrub volume tracks
    the corpus's internal passage structure, not the replication. The
    per-batch cost has two honest terms: the batch's own gram work
    (constant at fixed batch size) and the store scan for the seen-join
    (grows linearly with ingested tokens) — flat-ish early batches with a
    slowly rising store-scan tail is the expected curve; superlinear
    growth would mean the gram join is degenerating."""
    import shutil
    import tempfile
    import uuid as _uuid

    docs = spark.read.parquet(path)
    store = os.path.join(
        tempfile.gettempdir(), f"s4ps_incr_passage_probe_{_uuid.uuid4().hex}"
    )
    per_batch, scrubbed_tokens, store_rows = [], [], []
    for b in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == b)
        t0 = time.perf_counter()
        out = dedup.incremental_passage_scrub(
            batch, store, min_tokens=20, batch_id=b
        )
        removed = out.agg(
            F.sum(F.col("n_tokens_before") - F.col("n_tokens_after"))
        ).collect()[0][0]
        per_batch.append(round(time.perf_counter() - t0, 2))
        scrubbed_tokens.append(int(removed or 0))
        store_rows.append(spark.read.parquet(store).count())
    shutil.rmtree(store, ignore_errors=True)
    return {
        "batch_s": per_batch,
        "scrubbed_tokens": scrubbed_tokens,
        "store_rows": store_rows,
    }


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [2, 4]
    spark = get_spark(app_name="s4ps-dedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    # the 1x basis goes through the SAME build path (repartition(8)) as the
    # scaled dirs: the raw fixture is a single-row-group file whose scan
    # parallelism caps at 1 task (BASELINE.md round-5 finding), which would
    # make every scaled factor look sub-linear by construction
    base_path = "/tmp/s4ps_dedup_scale_x1"
    build_perturbed(spark, base_path, 1)
    base = time_ops(spark, base_path)
    report = {
        "base_s": base,
        "base_incremental": time_incremental(spark, base_path),
        "base_incremental_passage": time_incremental_passage(spark, base_path),
        "scaled": {},
    }
    for f in factors:
        path = f"/tmp/s4ps_dedup_scale_x{f}"
        t0 = time.time()
        build_perturbed(spark, path, f)
        build_s = round(time.time() - t0, 1)
        scaled = time_ops(spark, path)
        report["scaled"][f] = {
            "build_s": build_s,
            "times_s": scaled,
            "incremental": time_incremental(spark, path),
            "incremental_passage": time_incremental_passage(spark, path),
            "scaling": {
                k: round(scaled[k] / base[k], 2) if base[k] else None for k in scaled
            },
        }
    print(json.dumps(report))


if __name__ == "__main__":
    raise SystemExit(main())
