"""Per-column data profiling — the first job anyone runs on an unfamiliar
100 TB table: null rates, distinct cardinality, and value bounds per column,
in as few passes as the exactness contract allows.

Reference parity: the reference (in-memory pandas SQL layer, SURVEY.md §1.1)
had `df.describe()` a method call away; a distributed engine needs the same
answer as a query. This is the data-quality companion to
operators/audit.py's pipeline counters.

Scale shape: everything except distinct counts is ONE map-combined aggregate
pass (count/nulls/min/max all fold associatively). Exact multi-column
DISTINCT counts make Spark plan an Expand (one input row becomes one row per
counted column) feeding a single shuffled aggregate — |cols| × rows expand
volume, the honest price of exactness in one job. At the 100 TB design point
switch ``exact_distinct=False``: approx_count_distinct (HLL++, 2% default
error) collapses the whole profile back to the single map-side pass with
fixed-size sketch state per column. The catalog entry uses the exact form
(DuckDB replays it verbatim); the approx form is the declared scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column:
    ``(column, n_rows, n_nulls, n_distinct, min_val, max_val)``.

    min/max are computed on the NATIVE type (so string columns compare
    lexically, numerics numerically) and then rendered to string for the
    uniform schema. NULL-only columns yield NULL min/max. ``n_distinct``
    counts distinct NON-NULL values (SQL COUNT(DISTINCT col) semantics).
    """
    cols = cols or df.columns
    distinct_fn = F.countDistinct if exact_distinct else F.approx_count_distinct
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            e
            for c in cols
            for e in (
                # SQL SUM over zero rows is NULL — an empty table has 0
                # nulls, not unknown nulls
                F.coalesce(
                    F.sum(F.col(c).isNull().cast("long")), F.lit(0)
                ).alias(f"nulls_{c}"),
                distinct_fn(F.col(c)).alias(f"dist_{c}"),
                F.min(c).cast("string").alias(f"min_{c}"),
                F.max(c).cast("string").alias(f"max_{c}"),
            )
        ],
    )
    # fan the single aggregated row out with explode, NOT a union of
    # per-column selects: Catalyst plans each union branch as its own
    # aggregate over the source (measured: one full input scan per
    # profiled column), while explode-of-a-struct-array keeps exactly one
    # aggregate in the plan and fans out 1 row → |cols| rows for free
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"nulls_{c}").alias("n_nulls"),
                F.col(f"dist_{c}").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_val"),
                F.col(f"max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return agg.select(
        F.col("_n").alias("n_rows"), F.explode(per_col).alias("p")
    ).select(
        "p.column", "n_rows", "p.n_nulls", "p.n_distinct", "p.min_val", "p.max_val"
    )
