"""Approximate-aggregation sketches beyond the built-ins (SURVEY.md §2.4:
HLL distinct counts and KLL quantiles are Spark built-ins; heavy hitters —
approximate top-k by frequency — is not).

heavy_hitters_topk is the two-phase candidate/recount shape used at scale:

1. **Candidate generation, map-side only**: every Arrow batch counts its
   own values in pandas and emits just its top-M items (the per-batch
   counts are discarded — phase 2 recounts exactly, so shipping them
   would be dead data). No shuffle, no aggregation state proportional to
   global cardinality — the reason this exists: a plain groupBy+count
   over a high-cardinality column (URLs, doc hashes) carries every
   distinct item through partial-agg hash maps and the shuffle, while
   this carries at most M rows per batch.
2. **Exact recount of candidates only**: the (tiny) candidate set
   broadcast-semi-joins the input, and the exact groupBy runs over rows of
   candidate items alone → TakeOrdered top-k.

Accuracy contract: the result can only miss a true top-k item that failed
to make the per-batch top-M in EVERY batch it appears in. With batch rows
≤ R, an item of global frequency f spread over B batches averages f/B per
batch, so M ≥ (distinct items that can out-count f/B in one batch) makes a
miss impossible; in particular cardinality ≤ M makes the result EXACT
(how the catalog oracle checks it), and under Zipfian skew M = 4k is the
standard working choice. Counts reported are exact for every returned
item (phase 2 recounts), so errors can only be omissions, never wrong
counts — the property tests/test_sketches.py pins under adversarial skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_topk(
    df: DataFrame,
    item_col: str,
    k: int = 10,
    candidates_per_batch: int | None = None,
) -> DataFrame:
    """Approximate top-k most frequent values of ``item_col``.

    Output: (item, n) ordered by (n desc, item) — tie-broken so the row
    set is deterministic. ``candidates_per_batch`` (M) defaults to
    ``max(64, 4 * k)``.
    """
    m = candidates_per_batch or max(64, 4 * k)

    def batch_topm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # dropna=False: NULL is a countable value class (SQL GROUP BY
            # has a NULL group) — dropping it would silently omit a
            # NULL-heavy column's true top hitter
            top = pdf[item_col].value_counts(dropna=False).head(m)
            yield pd.DataFrame({"item": top.index})

    candidates = (
        df.select(item_col)
        .mapInPandas(
            batch_topm,
            schema=f"item {df.schema[item_col].dataType.simpleString()}",
        )
        .distinct()
    )
    return (
        df.join(
            F.broadcast(candidates),
            df[item_col].eqNullSafe(candidates["item"]),  # NULL must survive
            "left_semi",
        )
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "item")
        .limit(k)
    )
