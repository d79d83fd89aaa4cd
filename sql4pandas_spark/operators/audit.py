"""Zero-extra-scan pipeline auditing via Spark's Observation API.

A training-data pipeline must report what every gate dropped (for corpus
accounting and debugging), but a separate count() per gate re-scans the
input — at 100 TB that doubles the cost of every stage. ``df.observe``
attaches aggregate metrics to the EXISTING action: the counters ride along
with whatever job materializes the result, computed task-side at zero extra
passes. This is the Spark-native replacement for hand-rolled accumulators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def filter_with_audit(
    df: DataFrame, condition: Column, name: str = "quality_gate"
) -> tuple[DataFrame, Observation]:
    """Filter ``df`` by ``condition`` with ride-along audit counters.

    Returns ``(filtered_df, observation)``. After ANY action on the filtered
    frame, ``observation.get`` yields ``{"rows_seen": ..., "rows_kept": ...,
    "rows_rejected": ...}`` — exact counts measured by the same job, no
    second scan. The observation point sits BEFORE the filter so rejected
    rows are counted.
    """
    obs = Observation(name)
    kept = F.sum(F.when(condition, 1).otherwise(0))
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        kept.alias("rows_kept"),
        (F.count(F.lit(1)) - kept).alias("rows_rejected"),
    )
    return observed.filter(condition), obs


def observation_or_recount(obs: Observation, fallback) -> dict:
    """``Observation.get`` with a deterministic-recount escape hatch.

    PySpark 4's ``Observation.get`` converts the JVM metrics row via
    ``PythonSQLUtils.toPyRow``, which intermittently receives a
    SCHEMA-LESS row (``java.lang.AssertionError``) when the observe
    node's first materializing action is a nested eager checkpoint
    (observed reproducibly ~1-in-4 on the composed incremental pipeline).
    The metric VALUES are deterministic either way — only the row
    conversion flakes — so on that failure ``fallback()`` recomputes the
    same dict with an explicit aggregate. The fallback costs an extra
    job; the observation stays the declared zero-extra-scan production
    path.
    """
    try:
        return obs.get
    except Exception:
        return fallback()
