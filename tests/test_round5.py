"""Round-5 additions: TIMESTAMP_NTZ normalization everywhere, and
Engine.sql over streaming views.

The fixtures' timestamp columns are µs-no-timezone parquet → TIMESTAMP_NTZ
in Spark 4, which withWatermark rejects and numeric casts refuse. Every load
path (batch fixture reader, streaming reader, Engine.register_parquet) must
deliver TIMESTAMP (LTZ) — value-preserving under the pinned UTC session TZ.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql4pandas_spark.engine import Engine
from sql4pandas_spark.session import get_spark
from sql4pandas_spark.sources.parquet import normalize_ntz, register_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_no_ntz_survives_fixture_load(spark):
    tables = register_tables(spark, SF)
    leftover = {
        name: [c for c, t in df.dtypes if t == "timestamp_ntz"]
        for name, df in tables.items()
        if any(t == "timestamp_ntz" for _, t in df.dtypes)
    }
    assert not leftover, f"TIMESTAMP_NTZ leaked through _load: {leftover}"


def test_normalize_ntz_keeps_filter_pushdown(spark):
    """The NTZ→LTZ cast must not cost parquet predicate pushdown — Catalyst
    unwraps the cast in comparisons, so the scan still prunes row groups.
    This is the 100 TB guarantee: a date-filtered scan reads only the
    matching row groups whether or not the column needed normalization."""
    raw = spark.read.parquet(f"{SF}/lineitem.parquet")
    casted = normalize_ntz(raw)
    plan = (
        casted.filter(F.col("l_shipdate") <= "1998-09-02")
        .select("l_quantity")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_watermark_works_on_every_fixture_timestamp(spark):
    """Watermarks must be applicable to any loaded timestamp column, not just
    events.ts — this is what broke silently when orders/lineitem stayed NTZ."""
    tables = register_tables(spark, SF)
    orders = tables["orders"]
    # analysis (not execution) is where EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # used to throw; reaching the schema proves the type is watermarkable
    assert orders.withWatermark("o_orderdate", "1 day").schema is not None


def test_engine_sql_over_stream_matches_batch(spark):
    """The same SQL text over a streaming view and a batch view must agree
    once the stream is drained (availableNow batch-equivalence)."""
    eng = Engine(spark)
    eng.register_fixtures(SF)
    eng.register_events_stream(SF)
    sql = """
        SELECT window(ts, '1 hour').start AS w, event_type,
               count(*) AS n
        FROM {table}
        GROUP BY window(ts, '1 hour'), event_type
    """
    streamed = eng.sql(sql.format(table="events_stream"))
    assert streamed.is_streaming
    got = {tuple(r) for r in streamed.drain().collect()}
    want = {tuple(r) for r in eng.sql(sql.format(table="events")).collect()}
    assert got == want and len(want) > 0


def test_engine_register_stream_rejects_batch(spark):
    eng = Engine(spark)
    with pytest.raises(ValueError, match="streaming"):
        eng.register_stream("nope", spark.range(3))


def test_engine_register_parquet_normalizes(spark):
    eng = Engine(spark)
    eng.register_parquet("orders_raw", f"{SF}/orders.parquet")
    dtypes = dict(eng.sql("SELECT * FROM orders_raw").df.dtypes)
    assert dtypes["o_orderdate"] == "timestamp"


def test_pack_sequences_contiguous_fill(spark):
    """Packing semantics pinned on a hand-computable frame: docs laid
    end-to-end per group, seq_id = start_offset // budget, straddlers belong
    to the sequence they start in."""
    from sql4pandas_spark.operators.text import pack_sequences

    rows = [
        # source, doc_id, text (token counts 3, 4, 2, 5)
        ("a", 0, "w w w"),
        ("a", 1, "x x x x"),
        ("a", 2, "y y"),
        ("b", 0, "z z z z z"),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {
        (r.source, r.doc_id): (r.n_tokens_doc, r.seq_id)
        for r in pack_sequences(df, budget_tokens=5).collect()
    }
    # group a offsets: doc0 starts at 0 -> seq 0; doc1 starts at 3 -> seq 0
    # (straddles into 5..6 but belongs to its start bin); doc2 starts at 7 -> seq 1
    assert out == {
        ("a", 0): (3, 0),
        ("a", 1): (4, 0),
        ("a", 2): (2, 1),
        ("b", 0): (5, 0),
    }


def test_pack_sequences_single_shuffle(spark):
    """One shuffle only (on the group column) — the window cumsum reuses the
    same partitioning, so packing 100 TB costs one exchange."""
    from sql4pandas_spark.operators.text import pack_sequences
    from sql4pandas_spark.sources.parquet import table

    docs = table(spark, SF, "documents")
    plan = (
        pack_sequences(docs, budget_tokens=512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_engine_joins_pandas_parquet_and_stream(spark):
    """The README contract: registered pandas frames, parquet tables, and
    streaming sources join freely in one SQL statement. A stream-static join
    (stream events x pandas dimension) grouped by a dimension attribute must
    drain to the batch-equivalent answer."""
    import pandas as pd

    eng = Engine(spark)
    eng.register_fixtures(SF)
    eng.register_events_stream(SF)
    # pandas dimension: event_type -> funnel stage
    eng.register(
        "stages",
        pd.DataFrame(
            {
                "event_type": ["click", "view", "purchase", "signup", "error"],
                "stage": ["mid", "top", "bottom", "top", "ops"],
            }
        ),
    )
    sql = """
        SELECT s.stage, count(*) AS n, round(sum(e.value), 2) AS v
        FROM {events} e JOIN stages s ON e.event_type = s.event_type
        GROUP BY s.stage
    """
    streamed = eng.sql(sql.format(events="events_stream"))
    assert streamed.is_streaming
    got = {tuple(r) for r in streamed.drain().collect()}
    want = {tuple(r) for r in eng.sql(sql.format(events="events")).collect()}
    assert got == want and len(want) == 4


def test_incremental_dedup_across_batches(spark, tmp_path):
    """Cross-batch semantics: batch 2 content already in the store is
    dropped; within-batch duplicates keep the smallest id; the store grows
    by exactly the new distinct digests."""
    from sql4pandas_spark.operators.dedup import incremental_exact_dedup

    store = str(tmp_path / "digest_store")
    b1 = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha")], "doc_id long, text string"
    )
    kept1 = incremental_exact_dedup(b1, store)
    assert sorted(r.doc_id for r in kept1.collect()) == [0, 1]  # in-batch dup drops
    b2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma")], "doc_id long, text string"
    )
    kept2 = incremental_exact_dedup(b2, store)
    assert [r.doc_id for r in kept2.collect()] == [11]  # cross-batch dup drops
    assert spark.read.parquet(store).count() == 3  # alpha, beta, gamma
