"""Round-6 regression tests for the ADVICE fixes.

- Result.drain() must work on NON-aggregating streaming results: Spark
  rejects outputMode 'complete' for a plain SELECT-over-stream, so the
  default now picks the mode from the analyzed plan.
- q11's threshold must stay exact DECIMAL end-to-end: a double threshold
  could flip a part sitting within one ulp of the cut, diverging from the
  DuckDB oracle which keeps ``sum(val) * 0.001`` in decimal.
"""

from __future__ import annotations

from sql4pandas_spark.engine import Engine

SF = "/root/testdata/sf0.001"


def test_drain_default_handles_non_aggregating_stream(spark):
    eng = Engine(spark)
    eng.register_fixtures(SF)
    eng.register_events_stream(SF)
    streamed = eng.sql(
        "SELECT event_id, event_type FROM events_stream WHERE value > 90"
    )
    assert streamed.is_streaming
    got = {tuple(r) for r in streamed.drain().collect()}
    want = {
        tuple(r)
        for r in eng.sql(
            "SELECT event_id, event_type FROM events WHERE value > 90"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_drain_default_still_complete_for_aggregations(spark):
    eng = Engine(spark)
    eng.register_fixtures(SF)
    eng.register_events_stream(SF)
    streamed = eng.sql(
        "SELECT event_type, count(*) AS n FROM events_stream GROUP BY event_type"
    )
    got = {tuple(r) for r in streamed.drain().collect()}
    want = {
        tuple(r)
        for r in eng.sql(
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_drain_default_handles_stream_static_join_with_batch_aggregate(spark):
    """The plan contains an Aggregate node — but on the BATCH branch of a
    stream-static join, where 'complete' mode is still rejected. The
    default drain must fall back to 'append' instead of surfacing the
    AnalysisException (round-6 review finding: a substring probe alone
    misclassifies this shape)."""
    eng = Engine(spark)
    eng.register_fixtures(SF)
    eng.register_events_stream(SF)
    sql = (
        "SELECT e.event_id, a.avg_v FROM {t} e JOIN "
        "(SELECT event_type, round(avg(value), 4) AS avg_v FROM events "
        " GROUP BY event_type) a ON e.event_type = a.event_type "
        "WHERE e.value > 95"
    )
    streamed = eng.sql(sql.format(t="events_stream"))
    assert streamed.is_streaming
    got = {tuple(r) for r in streamed.drain().collect()}
    want = {tuple(r) for r in eng.sql(sql.format(t="events")).collect()}
    assert got == want and len(want) > 0


def test_q11_threshold_is_exact_decimal(spark):
    import re

    from sql4pandas_spark.queries.catalog import load_catalog

    df = load_catalog()["q11_important_stock"].build(spark, SF)
    # the declared result drops the threshold column, so assert on the
    # analyzed plan: the comparison operand must be decimal, never double
    analyzed = df._jdf.queryExecution().analyzed().toString().lower()
    m = re.search(r"\* cast\(0\.001 as ([\w(),]+)\)", analyzed)
    assert m, analyzed[:2000]
    assert m.group(1).startswith("decimal"), m.group(0)
