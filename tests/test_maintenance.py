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


def test_dynamic_overwrite_leaves_other_partitions_files_untouched(spark):
    """Value equality is proven by the catalog oracle; this pins the PHYSICAL
    claim — only partitions present in the incoming frame are rewritten, so
    the other partitions' files (names + mtimes) are bit-for-bit the same
    directory entries afterwards."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    t = register_tables(spark, SF_SMALL, ("documents",))
    out = os.path.join(tempfile.gettempdir(), "s4ps_test_dyn_overwrite")
    base = t["documents"].select("doc_id", "lang", "n_chars")
    base.write.mode("overwrite").partitionBy("lang").parquet(out)

    def snapshot(lang):
        d = os.path.join(out, f"lang={lang}")
        return {f: os.stat(os.path.join(d, f)).st_mtime_ns for f in os.listdir(d)}

    before_fr, before_en = snapshot("fr"), snapshot("en")
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        base.filter(F.col("lang") == "en").withColumn(
            "n_chars", F.col("n_chars") * 2
        ).write.mode("overwrite").partitionBy("lang").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    assert snapshot("fr") == before_fr, "untouched partition was rewritten"
    assert snapshot("en") != before_en, "targeted partition was not rewritten"


def test_range_clustering_tightens_row_group_stats(spark):
    """cluster_parquet_dir's whole value is a LAYOUT property: after
    range-clustering on n_chars, each parquet row group's min/max footer
    stats must cover a narrow, near-disjoint slice of the value domain
    (that is what lets a pushed-down predicate skip row groups), while a
    round-robin rewrite of the same rows leaves every row group spanning
    ~the whole domain. Asserted directly on the parquet footers —
    deterministic, no timing."""
    import pyarrow.parquet as pq

    from sql4pandas_spark.operators.maintenance import cluster_parquet_dir

    t = register_tables(spark, SF_SMALL, ("documents",))
    src_dir = os.path.join(tempfile.gettempdir(), "s4ps_test_cluster_src")
    flat = os.path.join(tempfile.gettempdir(), "s4ps_test_cluster_flat")
    clus = os.path.join(tempfile.gettempdir(), "s4ps_test_cluster_out")
    src = t["documents"].select("doc_id", "lang", "n_chars")
    n_rows = src.count()
    src.write.mode("overwrite").parquet(src_dir)

    # round-robin baseline: same rows, 4 files, no ordering
    compact_parquet_dir(spark, src_dir, flat, target_records_per_file=-(-n_rows // 4))
    out = cluster_parquet_dir(
        spark, src_dir, clus, ["n_chars"], target_records_per_file=-(-n_rows // 4)
    )
    assert out.count() == n_rows  # lossless

    def rg_spans(path: str) -> list[tuple[int, int]]:
        spans = []
        for f in _parquet_files(path):
            pf = pq.ParquetFile(f)
            idx = pf.schema_arrow.names.index("n_chars")
            for g in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(g).column(idx).statistics
                spans.append((st.min, st.max))
        return spans

    flat_spans, clus_spans = rg_spans(flat), rg_spans(clus)
    lo = min(s[0] for s in flat_spans)
    hi = max(s[1] for s in flat_spans)
    domain = hi - lo
    flat_cover = sum(b - a for a, b in flat_spans) / (domain * len(flat_spans))
    clus_cover = sum(b - a for a, b in clus_spans) / (domain * len(clus_spans))
    # round-robin row groups each span ~the full domain; clustered row
    # groups must cover well under half of it on average
    assert flat_cover > 0.8, (flat_cover, flat_spans)
    assert clus_cover < 0.5 * flat_cover, (clus_cover, flat_cover, clus_spans)
    # and the clustered spans are near-disjoint: total coverage ~1 domain
    assert sum(b - a for a, b in clus_spans) <= 1.2 * domain, clus_spans


def test_zorder_tightens_stats_on_every_dimension(spark):
    """Multi-column Z-order: after a Morton-interleaved rewrite on
    (doc_id, n_chars), BOTH dimensions' row-group spans must shrink well
    below the full domain — the property single-column clustering can't
    give (it tightens its sort column and leaves the others full-width).
    Assertions on parquet footers; thresholds leave headroom over the
    theoretical ~N^(-1/2) per-dimension coverage of 8 row groups."""
    import pyarrow.parquet as pq

    from sql4pandas_spark.operators.maintenance import zorder_parquet_dir

    t = register_tables(spark, SF_SMALL, ("documents",))
    src_dir = os.path.join(tempfile.gettempdir(), "s4ps_test_z_src")
    flat = os.path.join(tempfile.gettempdir(), "s4ps_test_z_flat")
    zdir = os.path.join(tempfile.gettempdir(), "s4ps_test_z_out")
    src = t["documents"].select("doc_id", "lang", "n_chars")
    n_rows = src.count()
    src.write.mode("overwrite").parquet(src_dir)

    per_file = -(-n_rows // 8)
    compact_parquet_dir(spark, src_dir, flat, target_records_per_file=per_file)
    out = zorder_parquet_dir(
        spark, src_dir, zdir, ["doc_id", "n_chars"], target_records_per_file=per_file
    )
    assert out.count() == n_rows  # lossless
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == sorted(
        r.doc_id for r in src.select("doc_id").collect()
    )

    def coverage(path: str, col: str) -> float:
        spans, lo, hi = [], None, None
        for f in _parquet_files(path):
            pf = pq.ParquetFile(f)
            idx = pf.schema_arrow.names.index(col)
            for g in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(g).column(idx).statistics
                spans.append((st.min, st.max))
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        return sum(b - a for a, b in spans) / ((hi - lo) * len(spans))

    for col in ("doc_id", "n_chars"):
        flat_cov = coverage(flat, col)
        z_cov = coverage(zdir, col)
        assert flat_cov > 0.8, (col, flat_cov)
        assert z_cov < 0.6, (col, z_cov)


def test_zorder_guards(spark, tmp_path):
    """Bit-budget and degenerate inputs must fail loudly or behave, never
    corrupt silently (round-6 review findings)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.maintenance import (
        zorder_key,
        zorder_parquet_dir,
    )

    # 5 cols x 16 bits would wrap Java's mod-64 shift -> must raise
    with _pytest.raises(ValueError, match="bits_per_col<=12"):
        zorder_key([F.lit(0)] * 5, bits_per_col=16)

    # empty source: lossless empty rewrite, no crash
    src = str(tmp_path / "empty_src")
    spark.createDataFrame([], "a long, b long").write.parquet(src)
    out = zorder_parquet_dir(spark, src, str(tmp_path / "empty_dst"), ["a", "b"])
    assert out.count() == 0

    # all-NULL cluster column: explicit error, not a silent garbage sort
    src2 = str(tmp_path / "null_src")
    spark.range(10).select(
        F.col("id").alias("a"), F.lit(None).cast("long").alias("b")
    ).write.parquet(src2)
    with _pytest.raises(ValueError, match="entirely NULL"):
        zorder_parquet_dir(spark, src2, str(tmp_path / "null_dst"), ["a", "b"])
