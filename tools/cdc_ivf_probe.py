#!/usr/bin/env python
"""Scale probe for the round-8 persistence operators.

1. CDC apply (streaming/cdc.cdc_apply_batch): per-batch wall time while the
   SNAPSHOT grows Nx and the changeset stays fixed-size. The versioned form
   rewrites the full snapshot per batch, so the honest expectation is
   ~LINEAR in snapshot size (the rewrite IO term) — the probe exists to
   catch superlinear growth, which would mean the anti-join degenerated
   (change keys no longer broadcast → snapshot shuffling on the join).

2. Persistent IVF (operators/similarity.save/add/load + query): build-save
   wall, incremental-add wall, and narrow- vs full-probe query wall at Nx
   vectors. add and full-probe should scale ~linearly (one matmul pass /
   full rescan); the NARROW probe reads only the probed cells' partitions
   (partition pruning on the (batch_id, cell) layout), so its growth should
   sit well under Nx.

Run:  python tools/cdc_ivf_probe.py [factor ...]   # default: 10
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators import similarity  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402
from sql4pandas_spark.streaming import cdc  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, id_col, factor, span=10_000_000):
    out = df
    for i in range(1, factor):
        out = out.unionByName(df.withColumn(id_col, F.col(id_col) + F.lit(i * span)))
    return out


def probe_cdc(spark, factor: int) -> dict:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    changes = (
        docs.filter(F.col("doc_id") % 10 == 2)
        .withColumn("n_chars", F.col("n_chars") + F.lit(1))
        .withColumn("op", F.lit("update"))
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 5).withColumn("op", F.lit("delete"))
        )
    )
    n_changes = changes.count()
    out = {}
    for fx in (1, factor):
        snap = replicate(docs, "doc_id", fx)
        root = tempfile.mkdtemp(prefix=f"s4ps_cdc_probe_{fx}x_")
        cdc.seed_snapshot(snap, root)
        n_snap = snap.count()
        walls = []
        for bid in range(3):  # 3 sequential batches, same-size changeset
            t0 = time.time()
            cdc.cdc_apply_batch(
                changes.withColumn("n_chars", F.col("n_chars") + F.lit(bid)),
                root,
                ["doc_id"],
                batch_id=bid,
            )
            walls.append(round(time.time() - t0, 2))
        out[f"{fx}x"] = {
            "snapshot_rows": n_snap,
            "changeset_rows": n_changes,
            "per_batch_wall_s": walls,
        }
    return out


def probe_ivf(spark, factor: int) -> dict:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    out = {}
    for fx in (1, factor):
        vecs = replicate(emb.filter(F.col("vec_id") != 0), "vec_id", fx)
        base = vecs.filter(F.col("vec_id") % 2 == 0)
        added = vecs.filter(F.col("vec_id") % 2 == 1)
        root = tempfile.mkdtemp(prefix=f"s4ps_ivf_probe_{fx}x_")
        t0 = time.time()
        idx = similarity.build_ivf_index(base, n_cells=16)
        similarity.save_ivf_index(idx, root)
        idx.assigned.unpersist()
        t_build = time.time()
        similarity.add_to_ivf_index(added, root, batch_id=1)
        t_add = time.time()
        loaded = similarity.load_ivf_index(vecs, root)
        loaded_narrow = similarity.ivf_query_topk(loaded, q, 10, n_probe=2)
        n_narrow = loaded_narrow.count()
        t_narrow = time.time()
        n_full = similarity.ivf_query_topk(loaded, q, 10, n_probe=16).count()
        t_full = time.time()
        out[f"{fx}x"] = {
            "n_vectors": vecs.count(),
            "build_save_s": round(t_build - t0, 2),
            "incremental_add_s": round(t_add - t_build, 2),
            "query_narrow_probe_s": round(t_narrow - t_add, 2),
            "query_full_probe_s": round(t_full - t_narrow, 2),
            "rows_narrow": n_narrow,
            "rows_full": n_full,
        }
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10]
    spark = get_spark(app_name="s4ps-cdc-ivf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for fx in factors:
        print(json.dumps({"probe": "cdc_apply", "factor": fx, **probe_cdc(spark, fx)}))
        print(json.dumps({"probe": "ivf_persistent", "factor": fx, **probe_ivf(spark, fx)}))


if __name__ == "__main__":
    main()
