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


def check_constraints(
    df: DataFrame, checks: list[tuple[str, Column]]
) -> DataFrame:
    """Declarative data-contract gate: evaluate named row-level
    constraints in ONE aggregate pass and return one report row per
    constraint — ``(check, n_rows, n_violations, violation_ppm)``. The
    expectations-style publish gate: ship the batch iff every
    n_violations is 0 (or under each contract's tolerance), and when it
    isn't, the report names WHICH contract broke and how widely.

    A row violates a check when its condition is not TRUE — a NULL
    condition (e.g. ``price > 0`` with NULL price) counts as a
    violation, because "unknown" does not satisfy a contract; express
    intended NULL-tolerance explicitly (``col.isNull() | cond``).
    violation_ppm is integer parts-per-million
    (``violations * 1_000_000 DIV rows``) — order-independent, no float
    rates.

    Scale shape: all checks fold in a single map-combined aggregate over
    one scan (a count() per check would re-scan the table per contract),
    then the 1-row result fans out via explode — |checks| report rows,
    zero joins. Complements referential_integrity_audit (cross-table
    contracts) and filter_with_audit (counters riding a REAL gate
    action); this one is the standalone report over a table at rest.
    """
    if not checks:
        raise ValueError("need at least one check")
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.coalesce(
                F.sum(F.when(~cond.eqNullSafe(True), 1)), F.lit(0)
            ).alias(f"_v_{i}")
            for i, (_, cond) in enumerate(checks)
        ],
    )
    per_check = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v_{i}").alias("n_violations"),
                F.expr(f"CASE WHEN _n > 0 THEN _v_{i} * 1000000 DIV _n "
                       "ELSE 0 END").alias("violation_ppm"),
            )
            for i, (name, _) in enumerate(checks)
        ]
    )
    return agg.select(F.explode(per_check).alias("c")).select(
        "c.check", "c.n_rows", "c.n_violations", "c.violation_ppm"
    )
