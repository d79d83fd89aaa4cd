"""Custom Python DataSource invariants (sources/synthetic.py): determinism,
partition invariance, pushdown correctness vs the pure row function, and the
documented Spark reader-caching sharp edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql4pandas_spark.sources.synthetic import read_synthetic, row_at

N = 5000


def _expected(pred=lambda r: True):
    return [row_at(i) for i in range(N) if pred(row_at(i))]


def test_full_scan_matches_row_function(spark):
    got = sorted(tuple(r) for r in read_synthetic(spark, N, 4).collect())
    exp = sorted(_expected())
    assert len(got) == N
    assert [g[0] for g in got] == [e[0] for e in exp]
    assert got[0][3] == exp[0][3] and got[-1][4] == exp[-1][4]


def test_partition_invariance(spark):
    a = sorted(tuple(r) for r in read_synthetic(spark, N, 4).collect())
    b = sorted(tuple(r) for r in read_synthetic(spark, N, 13).collect())
    assert a == b


def test_equalto_pushdown_count(spark):
    got = read_synthetic(spark, N, 4).filter(F.col("event_type") == "click").count()
    assert got == len(_expected(lambda r: r[3] == "click"))


def test_in_pushdown_count(spark):
    got = (
        read_synthetic(spark, N, 4)
        .filter(F.col("event_type").isin("click", "view"))
        .count()
    )
    assert got == len(_expected(lambda r: r[3] in ("click", "view")))


def test_unsupported_filter_still_applied_post_scan(spark):
    got = (
        read_synthetic(spark, N, 4)
        .filter((F.col("event_type") == "click") & (F.col("value") > 50))
        .count()
    )
    assert got == len(_expected(lambda r: r[3] == "click" and r[4] > 50))


def test_fresh_relations_are_isolated(spark):
    """The sharp edge documented on pushFilters: a fresh load per query must
    not see another query's pushed filters. (Reusing ONE handle for a
    filtered then unfiltered query DOES leak in Spark 4.1 — that behavior is
    why read_synthetic exists.)"""
    assert read_synthetic(spark, N, 4).filter(F.col("event_type") == "click").count() < N
    assert read_synthetic(spark, N, 4).count() == N


def test_joins_with_fixture_tables(spark):
    """The custom source composes with ordinary relations (the point of a
    data source: it's just another table)."""
    ev = read_synthetic(spark, N, 4)
    by_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert by_user.filter(F.col("user_id") < 0).count() == 0
    assert by_user.agg(F.sum("n")).collect()[0][0] == N


def test_stream_full_drain_equals_batch(spark):
    """availableNow over the streaming reader (batch_rows >= n_rows → one
    micro-batch drains everything) must equal the batch-mode read of the
    same source — the plugin's batch-equivalence contract."""
    from sql4pandas_spark.sources.synthetic import register_synthetic_source
    from sql4pandas_spark.streaming.windows import run_available_now

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", N).option("batch_rows", N).load()
    )
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    streamed = {
        (r.event_type, r.n) for r in run_available_now(agg, mode="complete").collect()
    }
    batch = {
        (r.event_type, r.n)
        for r in read_synthetic(spark, N, 4)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streamed == batch


def test_stream_checkpoint_resume_exactly_once(spark, tmp_path):
    """Each availableNow run resumes at the checkpointed offset: three runs
    with batch_rows=1000 land exactly rows 0..2999, no gaps, no duplicates —
    offset persistence + file-sink exactly-once."""
    from sql4pandas_spark.sources.synthetic import register_synthetic_source

    register_synthetic_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", N).option("batch_rows", 1000).load()
        )
        q = (
            stream.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        return spark.read.parquet(out).count()

    assert [drain(), drain(), drain()] == [1000, 2000, 3000]
    ids = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert ids == list(range(3000))


def test_values_oracle_constants_match_row_function():
    """scan_python_datasource pins its expected aggregate as a VALUES-list
    oracle; re-derive those constants from the pure row function so any
    generator change fails HERE before it can invalidate the oracle."""
    from collections import defaultdict

    from sql4pandas_spark.sources.synthetic import row_at

    agg = defaultdict(lambda: [0, 0.0, set()])
    for i in range(20_000):
        _, _, user, et, val = row_at(i)
        if et in ("click", "purchase"):
            a = agg[et]
            a[0] += 1
            a[1] += val
            a[2].add(user)
    got = {et: (a[0], round(a[1], 2), len(a[2])) for et, a in agg.items()}
    assert got == {
        "click": (3834, 187605.03, 983),
        "purchase": (4082, 203472.08, 979),
    }


def test_stream_values_oracle_constants_match_row_function():
    """stream_python_datasource pins the fully-drained per-type counts as a
    VALUES oracle; re-derive them from the pure row function."""
    from collections import Counter

    from sql4pandas_spark.sources.synthetic import row_at

    got = Counter(row_at(i)[3] for i in range(20_000))
    assert dict(got) == {
        "click": 3834,
        "error": 4038,
        "purchase": 4082,
        "signup": 4051,
        "view": 3995,
    }
