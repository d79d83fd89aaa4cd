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


def test_sink_is_bit_lossless_for_doubles_and_nullable_ints(spark):
    """Regression for the two Arrow-writer serialization traps (round-6
    review): pandas to_json truncates doubles at <=15 decimal PLACES
    (1e-12 → 0.0 at its default precision) and floats null-bearing int
    columns (1 → 1.0, unparseable by a long-schema read-back). The sink
    must round-trip both bit-exactly."""
    register_jsonl_sink(spark)
    out = os.path.join(tempfile.gettempdir(), "s4ps_test_jsonl_lossless")
    shutil.rmtree(out, ignore_errors=True)
    src = spark.createDataFrame(
        [
            (1, 1e-12, "a"),
            (2, 0.1 + 0.2, None),  # needs 17 significant digits
            (None, 3.141592653589793, "c"),
            (4, 1e-300, "d"),
        ],
        "id long, d double, s string",
    )
    src.coalesce(1).write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()
    back = spark.read.schema("id long, d double, s string").json(
        os.path.join(out, "*.jsonl")
    )
    got = sorted(back.collect(), key=lambda r: (r.id is None, r.id))
    want = sorted(src.collect(), key=lambda r: (r.id is None, r.id))
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # the doubles must be BIT-identical after the trip, not merely close
    assert {r.d for r in got} == {1e-12, 0.1 + 0.2, 3.141592653589793, 1e-300}
