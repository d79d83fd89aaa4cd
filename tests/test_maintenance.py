"""Small-file compaction: file-count collapse + losslessness."""

from __future__ import annotations

import glob
import os
import tempfile

from sql4pandas_spark.operators.maintenance import compact_parquet_dir
from sql4pandas_spark.sources.parquet import register_tables
from tests.conftest import SF_SMALL


def _parquet_files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "*.parquet"))


def test_compaction_collapses_files_and_preserves_rows(spark):
    t = register_tables(spark, SF_SMALL, ("documents",))
    frag = os.path.join(tempfile.gettempdir(), "s4ps_test_compact_frag")
    comp = os.path.join(tempfile.gettempdir(), "s4ps_test_compact_out")
    src = t["documents"].select("doc_id", "lang", "n_chars")
    src.repartition(64).write.mode("overwrite").parquet(frag)
    n_rows = src.count()
    assert len(_parquet_files(frag)) == 64

    out = compact_parquet_dir(spark, frag, comp, target_records_per_file=n_rows)
    assert len(_parquet_files(comp)) == 1, "all rows fit one target-size file"
    assert out.count() == n_rows

    # sub-target sizing: ceil(rows / target) evenly-sized files
    comp2 = comp + "_2"
    half = max(1, n_rows // 2)
    compact_parquet_dir(spark, frag, comp2, target_records_per_file=half)
    expected = -(-n_rows // half)
    assert len(_parquet_files(comp2)) == expected
