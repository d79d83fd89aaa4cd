"""Custom Python DataSource writer: two-phase commit manifest + losslessness."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

from sql4pandas_spark.sources.jsonl_sink import register_jsonl_sink
from sql4pandas_spark.sources.parquet import register_tables
from tests.conftest import SF_SMALL


def test_manifest_lists_exactly_the_committed_parts(spark):
    register_jsonl_sink(spark)
    t = register_tables(spark, SF_SMALL, ("orders",))
    out = os.path.join(tempfile.gettempdir(), "s4ps_test_jsonl_sink")
    shutil.rmtree(out, ignore_errors=True)
    proj = t["orders"].select("o_orderkey", "o_totalprice").repartition(4)
    proj.write.format("jsonl_sink").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    on_disk = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "*.jsonl"))
    )
    assert manifest["files"] == on_disk and len(on_disk) == 4
    assert manifest["rows"] == proj.count()

    back = spark.read.schema("o_orderkey long, o_totalprice double").json(
        os.path.join(out, "*.jsonl")
    )
    assert back.count() == manifest["rows"]
    assert sorted(r[0] for r in back.select("o_orderkey").collect()) == sorted(
        r[0] for r in proj.select("o_orderkey").collect()
    )
