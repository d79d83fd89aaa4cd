"""observe()-based audit counters: exact, zero extra scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql4pandas_spark.operators.audit import filter_with_audit
from sql4pandas_spark.sources.parquet import register_tables
from tests.conftest import SF_SMALL


def test_filter_with_audit_counts_match_exact(spark):
    t = register_tables(spark, SF_SMALL, ("documents",))
    docs = t["documents"]
    cond = F.col("n_chars") >= 200
    filtered, obs = filter_with_audit(docs, cond)
    n_kept_action = filtered.count()  # the action the metrics ride along with

    total = docs.count()
    kept = docs.filter(cond).count()
    assert obs.get == {
        "rows_seen": total,
        "rows_kept": kept,
        "rows_rejected": total - kept,
    }
    assert n_kept_action == kept


def test_observation_or_recount_fallback():
    """The recount fallback fires on a conversion failure and returns the
    fallback dict unchanged; a healthy observation is passed through."""
    from sql4pandas_spark.operators.audit import observation_or_recount

    class _Broken:
        @property
        def get(self):
            raise RuntimeError("toPyRow assertion")

    class _Healthy:
        @property
        def get(self):
            return {"n": 7}

    assert observation_or_recount(_Broken(), lambda: {"n": 3}) == {"n": 3}
    assert observation_or_recount(_Healthy(), lambda: {"n": 3}) == {"n": 7}
