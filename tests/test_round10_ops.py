"""Round-10 fixes: join_fanout multi-column keys, cache-leak removal
(ReusedExchange instead of persist), top_movers calendar adjacency, and
value_histogram NaN handling."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F


# ------------------------------------- join_fanout multi-column keys


def test_join_fanout_multi_key_does_not_collapse_tuples(spark):
    """('ab','c') and ('a','bc') are DIFFERENT composite keys: a
    separator-less concat merged them within a side and fabricated
    matches across sides (the round-9 ADVICE medium finding)."""
    from sql4pandas_spark.operators.profile import join_fanout_estimate

    left = spark.createDataFrame(
        [("ab", "c"), ("ab", "c"), ("a", "bc")], ["k1", "k2"]
    )
    right = spark.createDataFrame(
        [("ab", "c"), ("x", "y")], ["r1", "r2"]
    )
    est = join_fanout_estimate(left, right, ["k1", "k2"], ["r1", "r2"])
    rows = est.collect()
    actual = left.join(
        right, (left.k1 == right.r1) & (left.k2 == right.r2)
    ).count()
    # only ('ab','c') matches: 2 left x 1 right = 2 rows out; the old
    # concat collapsed ('a','bc') into the same key and reported 3x1
    assert actual == 2
    assert rows[0]["total_rows_out"] == 2
    assert rows[0]["n_matching_keys"] == 1
    assert (rows[0]["n_left"], rows[0]["n_right"]) == (2, 1)
    assert rows[0]["key"] == "ab\x1fc"


def test_join_fanout_single_key_report_unchanged(spark):
    from sql4pandas_spark.operators.profile import join_fanout_estimate

    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(1,), (1,), (1,), (2,), (9,)], ["r"])
    rows = join_fanout_estimate(left, right, ["k"], ["r"], top_k=5).collect()
    assert rows[0]["total_rows_out"] == 7
    assert rows[0]["key"] == "1"  # no separator artifacts on single keys


# --------------------------- persist removal: shuffle reuse, no cache


@pytest.mark.parametrize(
    "build",
    [
        pytest.param("key_skew", id="key_skew_profile"),
        pytest.param("fanout", id="join_fanout_estimate"),
        pytest.param("mad", id="mad_anomalies"),
        pytest.param("chisq", id="categorical_association"),
    ],
)
def test_profile_operators_reuse_exchange_and_pin_no_cache(spark, build):
    """The multi-consumer counts frames must be served by AQE
    ReusedExchange (single scan) with ZERO persisted storage left
    behind — a .persist() on a lazily-returned frame has no unpersist
    point and accumulated cached frames across calls (round-9 ADVICE)."""
    from sql4pandas_spark.operators.profile import (
        categorical_association,
        join_fanout_estimate,
        key_skew_profile,
        mad_anomalies,
    )

    def persistent_rdd_ids() -> set[int]:
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, ids = m.keysIterator(), set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    # RELATIVE cleanliness: assert the operator ADDS no session residue.
    # Absolute-emptiness asserts were order-fragile — earlier tests in the
    # shared session legitimately persist-and-unpersist (near-dedup sigs)
    # or localCheckpoint (salted fuzzy band frames), and their RDD blocks
    # linger until the ContextCleaner GC sweep.
    spark.catalog.clearCache()  # CacheManager reset so isEmpty is OURS
    rdds_before = persistent_rdd_ids()

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    if build == "key_skew":
        out = key_skew_profile(events, "event_type", top_k=5)
    elif build == "fanout":
        out = join_fanout_estimate(
            docs, docs.selectExpr("lang AS l2"), ["lang"], ["l2"], top_k=5
        )
    elif build == "mad":
        out = mad_anomalies(events, "ts", "event_type", bucket="day")
    else:
        out = categorical_association(docs, "lang", "source")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    if build == "chisq":
        # column-pruned subplans differ -> no exchange reuse possible;
        # a GC-cleanable localCheckpoint replaces the leaking persist
        assert "Scan ExistingRDD" in final
        # chisq's own localCheckpoint block is the ONE permitted new RDD
        # (GC-owned, ContextCleaner-released — never the CacheManager)
    else:
        assert "ReusedExchange" in final, f"no exchange reuse in {build}"
        new_rdds = persistent_rdd_ids() - rdds_before
        assert not new_rdds, f"{build} left persisted RDDs behind: {new_rdds}"
    # none of them may register in the CacheManager — THAT is the leak
    # (CacheManager holds plans until an explicit unpersist; RDD-level
    # localCheckpoint blocks are ContextCleaner-released on GC)
    assert "InMemoryTableScan" not in final
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        f"{build} left a CacheManager entry behind"
    )


def test_mad_anomalies_values_survive_persist_removal(spark):
    """Semantics check: same flags as a hand-computed MAD on a tiny
    series (one spike among steady hourly counts)."""
    from sql4pandas_spark.operators.profile import mad_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(8):
        n = 50 if h == 3 else 4 + (h % 2)
        rows += [("g", base + dt.timedelta(hours=h, seconds=s)) for s in range(n)]
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = mad_anomalies(df, "ts", "event_type", bucket="hour", k=3).collect()
    assert [(r["bucket_ts"].hour, r["n_events"]) for r in out] == [(3, 50)]


# ------------------------------------- top_movers calendar adjacency


def test_top_movers_nulls_prev_after_silent_gap(spark):
    """A group returning after a silent week must NOT report growth
    against the stale last-active bucket (round-9 ADVICE): weeks 1,2
    are adjacent (row emitted), week 4 follows silent week 3 (no row)."""
    from sql4pandas_spark.operators.behavior import top_movers

    w1 = dt.datetime(2024, 1, 1)  # a Monday: date_trunc-week-stable
    rows = []
    for week, n in [(0, 4), (1, 6), (3, 12)]:
        ts = w1 + dt.timedelta(weeks=week)
        rows += [("a", ts + dt.timedelta(minutes=i)) for i in range(n)]
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = top_movers(df, "event_type", bucket="week").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["bucket_ts"], r["n_events"], r["prev_events"]) == (
        w1 + dt.timedelta(weeks=1),
        6,
        4,
    )
    assert r["growth_ppm"] == (6 - 4) * 1_000_000 // 4


# ------------------------------------- value_histogram NaN handling


def test_value_histogram_drops_nan_keeps_infinity_clamped(spark):
    from sql4pandas_spark.operators.sketches import value_histogram

    df = spark.createDataFrame(
        [(0.5,), (float("nan"),), (float("inf",),), (float("-inf"),), (9.5,)],
        ["x"],
    )
    hist = {r["bin"]: r["n"] for r in value_histogram(df, "x", 0.0, 10.0, 10).collect()}
    # NaN dropped; +inf clamps to top bin, -inf to bottom bin
    assert hist == {0: 2, 9: 2}


# ------------------------------------- SQL front-end (reference dialect)


def test_transpile_renames_call_position_only():
    from sql4pandas_spark.functions.transpile import transpile_duckdb

    out = transpile_duckdb(
        "SELECT len(xs) AS n, substr(s, 1, 2) AS p FROM t "
        "WHERE regexp_matches(s, 'a+') AND power(x, 2) > sign(y)"
    )
    assert out == (
        "SELECT size(xs) AS n, substring(s, 1, 2) AS p FROM t "
        "WHERE rlike(s, 'a+') AND pow(x, 2) > signum(y)"
    )


def test_transpile_protects_literals_identifiers_and_bare_names():
    from sql4pandas_spark.functions.transpile import transpile_duckdb

    # 'len(x)' is a string; "len" a quoted identifier; bare `len` a column
    out = transpile_duckdb(
        """SELECT 'len(x)' AS lit, "len", len FROM t WHERE a // b > 2"""
    )
    assert "'len(x)'" in out and "`len`" in out  # ident → Spark backticks
    assert " size" not in out  # no call position, no rename
    assert " DIV " in out and "//" not in out
    # '//' inside a literal survives
    out2 = transpile_duckdb("SELECT 'a//b' AS s, x // 3 AS d FROM t")
    assert "'a//b'" in out2 and " DIV 3" in out2.replace("  ", " ")


def test_transpile_unknown_dialect_rejected():
    import pytest as _pytest

    from sql4pandas_spark.functions.transpile import to_spark_sql

    with _pytest.raises(ValueError, match="unknown dialect"):
        to_spark_sql("SELECT 1", dialect="oracle11g")
    assert to_spark_sql("SELECT len(x) FROM t") == "SELECT len(x) FROM t"


def test_engine_runs_reference_dialect_sql(spark):
    """The SAME statement text runs on DuckDB (reference dialect) and on
    the Engine with dialect='duckdb' — SQL strings in, frames out."""
    import duckdb
    import pandas as pd

    from sql4pandas_spark import Engine

    pdf = pd.DataFrame(
        {"s": ["a b c", "d e", "f", "g h i j"], "k": [1, 2, 3, 4]}
    )
    stmt = (
        "SELECT CAST(sum(len(string_split(s, ' '))) AS BIGINT) AS n_tokens, "
        "CAST(sum(CASE WHEN regexp_matches(s, '[aeiou]') THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_vowel_rows, CAST(sum(k // 2) AS BIGINT) AS half_sum "
        "FROM t"
    )
    con = duckdb.connect()
    con.register("t", pdf)
    expected = con.execute(stmt).fetchall()
    con.close()

    eng = Engine(spark)
    eng.register("t", pdf)
    got = [tuple(r) for r in eng.sql(stmt, dialect="duckdb").collect()]
    assert got == expected


# ------------------------------------- skew-salted fuzzy band join


def test_salted_fuzzy_pairs_identical_on_degenerate_keys(spark):
    """The docstring's degenerate regime: serial IDs share nearly all
    n-grams, collapsing LSH bands. Salting must spread the hot bands and
    return the EXACT same pair set as the unsalted join."""
    from sql4pandas_spark.operators.joins import fuzzy_key_pairs

    clean = spark.createDataFrame(
        [(f"Customer#{i:09d}",) for i in range(60)], ["name"]
    )
    # one char deleted mid-string for every 3rd key
    dirty = spark.createDataFrame(
        [(f"Customer#{i:09d}"[:11] + f"Customer#{i:09d}"[12:],)
         for i in range(0, 60, 3)],
        ["dname"],
    )
    base = {
        (r["left_key_value"], r["right_key_value"], r["key_distance"])
        for r in fuzzy_key_pairs(dirty, clean, "dname", "name").collect()
    }
    salted = {
        (r["left_key_value"], r["right_key_value"], r["key_distance"])
        for r in fuzzy_key_pairs(
            dirty, clean, "dname", "name",
            salt_hot_bands=4, hot_band_product=1,  # force EVERY band hot
        ).collect()
    }
    assert salted == base and base  # identical and non-empty


def test_salted_fuzzy_pairs_mixed_hot_cold(spark):
    """Mid threshold: some bands salt, some don't — union still exact."""
    from sql4pandas_spark.operators.joins import fuzzy_key_pairs

    names = [f"Customer#{i:09d}" for i in range(40)] + [
        "alice smith", "bob jones", "carol white", "dave black",
    ]
    clean = spark.createDataFrame([(n,) for n in names], ["name"])
    dirty = spark.createDataFrame(
        [(n[:3] + n[4:],) for n in names[::4]], ["dname"]
    )
    kw = dict(max_distance=2, n_hashes=24, n_bands=12)
    base = {
        tuple(r) for r in fuzzy_key_pairs(
            dirty, clean, "dname", "name", **kw
        ).collect()
    }
    salted = {
        tuple(r) for r in fuzzy_key_pairs(
            dirty, clean, "dname", "name", **kw,
            salt_hot_bands=3, hot_band_product=25,
        ).collect()
    }
    assert salted == base and base


# ------------------------------------- streaming sketch-state maintenance


def _land_one_file(df, landing_dir, fname):
    import os
    import shutil
    import uuid as _uuid

    stage = os.path.join(landing_dir, f"_stage_{_uuid.uuid4().hex[:8]}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    (part,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    os.makedirs(landing_dir, exist_ok=True)
    shutil.copyfile(os.path.join(stage, part), os.path.join(landing_dir, fname))
    shutil.rmtree(stage, ignore_errors=True)


def test_heavy_hitter_stream_matches_batch_recount(spark, tmp_path):
    """Two drains over a shared checkpoint (resume), final state == exact
    full recount (per-batch vocab under m ⇒ provably exact)."""
    from sql4pandas_spark.streaming import sketches as sk

    store = str(tmp_path / "store")
    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, ["item"]
    )
    b2 = spark.createDataFrame(
        [("a",)] * 2 + [("c",)] * 7 + [("d",)] * 4, ["item"]
    )
    sk.empty_state(spark, "item string, n long", store)

    _land_one_file(b1, land, "batch_00.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(land)
    sk.run_heavy_hitter_stream(stream, store, "item", m=8, checkpoint=ckpt)

    _land_one_file(b2, land, "batch_01.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(land)
    sk.run_heavy_hitter_stream(stream, store, "item", m=8, checkpoint=ckpt)

    final = {r["item"]: r["n"] for r in sk.latest_state(spark, store).collect()}
    assert final == {"a": 7, "b": 3, "c": 8, "d": 4}


def test_histogram_stream_matches_batch_histogram(spark, tmp_path):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sketches import value_histogram
    from sql4pandas_spark.streaming import sketches as sk

    store = str(tmp_path / "store")
    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    full = spark.range(1000).select((F.col("id") % 97).cast("double").alias("v"))
    b1 = full.filter(F.col("v") < 50)
    b2 = full.filter(F.col("v") >= 50)
    sk.empty_state(spark, "bin long, n long", store)

    _land_one_file(b1, land, "batch_00.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(land)
    sk.run_histogram_stream(stream, store, "v", 0.0, 100.0, 20, checkpoint=ckpt)

    _land_one_file(b2, land, "batch_01.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(land)
    sk.run_histogram_stream(stream, store, "v", 0.0, 100.0, 20, checkpoint=ckpt)

    got = {r["bin"]: r["n"] for r in sk.latest_state(spark, store).collect()}
    want = {
        r["bin"]: r["n"]
        for r in value_histogram(full, "v", 0.0, 100.0, 20).collect()
    }
    assert got == want


def test_sketch_apply_batch_replay_idempotent_and_guarded(spark, tmp_path):
    """Replaying the last uncommitted batch rewrites the same version from
    the same input (no double count); a renumbered batch id raises."""
    import pytest as _pytest

    from sql4pandas_spark.operators.sketches import merge_heavy_hitter_states
    from sql4pandas_spark.streaming import sketches as sk

    store = str(tmp_path / "store")
    sk.empty_state(spark, "item string, n long", store)
    b = spark.createDataFrame([("a", 5), ("b", 2)], "item string, n long")
    sk.sketch_apply_batch(b, store, merge_heavy_hitter_states, 0)  # v1
    sk.sketch_apply_batch(b, store, merge_heavy_hitter_states, 0)  # replay v1
    final = {r["item"]: r["n"] for r in sk.latest_state(spark, store).collect()}
    assert final == {"a": 5, "b": 2}  # NOT doubled
    with _pytest.raises(RuntimeError, match="misalignment"):
        sk.sketch_apply_batch(b, store, merge_heavy_hitter_states, 5)


# ------------------------------------- prefix-filter exact Jaccard join


def test_prefix_filter_equals_allpairs_on_threshold_spanning_corpus(spark):
    """Synthetic corpus whose pair similarities straddle the threshold,
    including an exact-boundary pair — prefix filtering must lose
    nothing (the globally-smallest shared shingle sits in both
    prefixes)."""
    from sql4pandas_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = [
        # near-identical pair (J high)
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        # moderate-overlap pair
        (3, "alpha beta gamma delta kappa lambda mu nu"),
        # low-overlap docs
        (4, "omicron pi rho sigma tau upsilon phi chi"),
        (5, "omicron pi psi omega alef bet gimel dalet"),
        # short-doc fallback (whole-text shingle)
        (6, "he said"),
        (7, "he said"),
        # boilerplate-heavy docs (hot shingles land LAST in rare-first order)
        (8, "the quick brown fox jumps over the lazy dog again today"),
        (9, "the quick brown fox jumps over the lazy dog again tomorrow"),
        (10, "the quick brown fox sleeps under the lazy dog again today"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for thr in (0.2, 0.5, 0.8):
        base = {tuple(r) for r in ngram_jaccard_pairs(df, threshold=thr).collect()}
        pf = {
            tuple(r)
            for r in prefix_filter_jaccard_pairs(df, threshold=thr).collect()
        }
        assert pf == base, f"threshold {thr}: {pf ^ base}"
    # sanity: thresholds actually discriminate on this corpus
    n_02 = len(ngram_jaccard_pairs(df, threshold=0.2).collect())
    n_08 = len(ngram_jaccard_pairs(df, threshold=0.8).collect())
    assert n_02 > n_08


def test_prefix_filter_exact_boundary_pair(spark):
    """A pair sitting EXACTLY at the threshold must survive (the
    integer-exact ceil can't shorten a prefix past the safe bound)."""
    from sql4pandas_spark.operators.dedup import prefix_filter_jaccard_pairs

    # 3-gram shingle sets: doc1 has 4 shingles, doc2 has 4, overlap 2
    # J = 2 / (4 + 4 - 2) = 1/3 — test at threshold exactly 1/3 (e6 334/3?)
    # use t=0.3333 (below) and 0.3334 (above): the pair flips
    d = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # shingles: abc bcd cde def
            (2, "a b c d x y"),   # shingles: abc bcd cdx dxy → overlap {abc,bcd}
        ],
        ["doc_id", "text"],
    )
    lo = prefix_filter_jaccard_pairs(d, threshold=0.3333).collect()
    hi = prefix_filter_jaccard_pairs(d, threshold=0.3334).collect()
    assert len(lo) == 1 and abs(lo[0]["jaccard"] - 0.3333) < 1e-9
    assert len(hi) == 0


def test_transpile_bare_varchar_cast(spark):
    """DuckDB CAST(x AS VARCHAR) is legal without a length; Spark demands
    one — the transpiler rewrites the bare type to STRING (VARCHAR(n)
    passes through, both engines accept it)."""
    from sql4pandas_spark.functions.transpile import transpile_duckdb

    out = transpile_duckdb(
        "SELECT CAST(x AS VARCHAR) AS s, CAST(y AS VARCHAR(10)) AS v, "
        "'VARCHAR' AS lit FROM t"
    )
    assert "CAST(x AS STRING)" in out
    assert "VARCHAR(10)" in out
    assert "'VARCHAR'" in out
    got = [
        tuple(r)
        for r in spark.sql(
            transpile_duckdb("SELECT CAST(42 AS VARCHAR) AS s")
        ).collect()
    ]
    assert got == [("42",)]


def test_psi_from_histograms_equals_distribution_drift(spark):
    """The histogram-state PSI read-out must reproduce the raw-row drift
    gate on the same fixed grid (streaming monitoring == batch gate)."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.profile import (
        distribution_drift,
        psi_from_histograms,
    )
    from sql4pandas_spark.operators.sketches import value_histogram

    full = spark.range(2000).select(
        (F.col("id") % 37).cast("double").alias("v"),
        (F.col("id") % 2).alias("half"),
    )
    old = full.filter("half = 0")
    new = full.filter("half = 1")
    raw = {
        r["bin"]: (r["n_old"], r["n_new"], r["p"], r["q"], r["psi"])
        for r in distribution_drift(old, new, "v", n_bins=8, lo=0.0, hi=40.0).collect()
    }
    grid = dict(value_col="v", lo=0.0, hi=40.0, n_bins=8)
    st = {
        r["bin"]: (r["n_old"], r["n_new"], r["p"], r["q"], r["psi"])
        for r in psi_from_histograms(
            value_histogram(old, **grid), value_histogram(new, **grid), 8
        ).collect()
    }
    assert st == raw


# ------------------------------------- count-min sketch


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """Adversarial: vocabulary (600) far exceeds width (64), forcing
    collisions — every estimate must be >= exact, and the min-over-rows
    must keep the worst overcount within a few multiples of 2N/width."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sketches import cms_lookup, count_min_state

    df = spark.range(6000).select(
        F.concat(F.lit("tok"), (F.pmod(F.col("id") * 7919, F.lit(600)))).alias("item")
    )
    state = count_min_state(df, "item", depth=4, width=64)
    exact = df.groupBy("item").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_lookup(state, exact.select("item"), "item", depth=4, width=64)
    rows = exact.join(est, "item").collect()
    n_total = 6000
    bound = 2 * n_total / 64  # classic single-row expectation bound
    assert all(r["cms_n"] >= r["exact_n"] for r in rows)
    worst = max(r["cms_n"] - r["exact_n"] for r in rows)
    assert worst <= 4 * bound, worst  # min over 4 rows: far inside
    # collisions actually happened (the test would be vacuous otherwise)
    assert any(r["cms_n"] > r["exact_n"] for r in rows)


def test_cms_merge_equals_global_build(spark):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sketches import (
        count_min_state,
        merge_cms_states,
    )

    df = spark.range(3000).select(
        (F.col("id") % 97).cast("string").alias("item"), (F.col("id") % 3).alias("b")
    )
    merged = None
    for b in range(3):
        part = count_min_state(df.filter(F.col("b") == b), "item", depth=3, width=32)
        merged = part if merged is None else merge_cms_states(merged, part)
    want = {
        (r["row"], r["col"]): r["n"]
        for r in count_min_state(df, "item", depth=3, width=32).collect()
    }
    got = {(r["row"], r["col"]): r["n"] for r in merged.collect()}
    assert got == want


def test_cms_absent_item_reads_zero_when_cell_empty(spark):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sketches import cms_lookup, count_min_state

    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["item"])
    state = count_min_state(df, "item", depth=4, width=256)
    probe = spark.createDataFrame([("never-seen-xyz",)], ["item"])
    (row,) = cms_lookup(state, probe, "item", depth=4, width=256).collect()
    # width 256 with 2 distinct items: astronomically unlikely all 4 cells
    # collide — the empty-cell path must return 0, not NULL
    assert row["cms_n"] == 0


# ------------------------------------- mergeable weighted sampling


def test_merged_weighted_sample_equals_global(spark):
    """A-ES keys are row-stable, so per-batch top-k states merge to
    EXACTLY the global sample — including under adversarial batch skew
    (one batch holding most of the winners)."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sampling import (
        merge_weighted_samples,
        weighted_sample_topk,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        # heavy weights concentrated in one batch (id % 5 == 0)
        F.when(F.col("id") % 5 == 0, F.col("id") * 100 + 1)
        .otherwise(F.col("id") % 7 + 1)
        .cast("double")
        .alias("w"),
    )
    want = [tuple(r) for r in weighted_sample_topk(df, "w", k=20).collect()]
    states = [
        weighted_sample_topk(df.filter(F.col("doc_id") % 4 == b), "w", k=20)
        for b in range(4)
    ]
    got = [tuple(r) for r in merge_weighted_samples(states, k=20).collect()]
    assert got == want
    # re-merging the same state is idempotent (sampling, unlike additive
    # sketches, tolerates replay)
    again = [
        tuple(r) for r in merge_weighted_samples(states + [states[0]], k=20).collect()
    ]
    assert again == want


# ------------------------------------- MinHash set-overlap signatures


def test_set_signatures_merge_and_estimate_overlap(spark):
    """Per-key signatures merge by elementwise min to exactly the global
    signature, and pair estimates track true Jaccard within the
    sqrt(J(1-J)/n) band on constructed overlapping sets."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sketches import (
        estimated_jaccard_pairs,
        merge_set_signatures,
        minhash_set_signatures,
    )

    # A = [0, 600), B = [300, 900): true J = 300/900 = 1/3
    # C = [0, 900): J(A,C) = 600/900 = 2/3, J(B,C) = 600/900 = 2/3
    rows = (
        [("A", i) for i in range(600)]
        + [("B", i) for i in range(300, 900)]
        + [("C", i) for i in range(900)]
    )
    df = spark.createDataFrame(rows, "key string, item long")
    n = 128
    sigs = minhash_set_signatures(df, "key", "item", n_hashes=n)
    est = {
        (r.key_a, r.key_b): r.est_jaccard_e4 / 10000.0
        for r in estimated_jaccard_pairs(sigs, n).collect()
    }
    assert abs(est[("A", "B")] - 1 / 3) < 0.15
    assert abs(est[("A", "C")] - 2 / 3) < 0.15
    assert abs(est[("B", "C")] - 2 / 3) < 0.15
    # merge law under a 3-way batch split
    parts = [
        minhash_set_signatures(
            df.filter(F.col("item") % 3 == b), "key", "item", n_hashes=n
        )
        for b in range(3)
    ]
    merged = merge_set_signatures(merge_set_signatures(parts[0], parts[1]), parts[2])
    assert {r.key: r.sig for r in merged.collect()} == {
        r.key: r.sig for r in sigs.collect()
    }


def test_set_signatures_null_items_and_empty(spark):
    from sql4pandas_spark.operators.sketches import minhash_set_signatures

    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("b", None)], "key string, item long"
    )
    out = {r.key: r.sig for r in minhash_set_signatures(df, "key", "item", 8).collect()}
    # key with only NULL items vanishes (empty set has no signature);
    # NULLs never contribute components
    assert set(out) == {"a"} and len(out["a"]) == 8
    empty = spark.createDataFrame([], "key string, item long")
    assert minhash_set_signatures(empty, "key", "item", 8).collect() == []


def test_cms_stream_matches_batch_build(spark, tmp_path):
    """Streaming CMS: two resume-checkpoint drains fold to exactly the
    global-build state (per-cell sums of batch counts == global cells)."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sketches import count_min_state
    from sql4pandas_spark.streaming import sketches as sk

    store = str(tmp_path / "store")
    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    full = spark.range(800).select((F.col("id") % 37).cast("string").alias("item"))
    b1 = full.filter(F.length("item") == 1)
    b2 = full.filter(F.length("item") > 1)
    sk.empty_state(spark, "row int, col int, n long", store)
    for i, b in enumerate((b1, b2)):
        _land_one_file(b, land, f"batch_{i:02d}.parquet")
        stream = spark.readStream.schema(b.schema).parquet(land)
        sk.run_cms_stream(stream, store, "item", depth=3, width=32, checkpoint=ckpt)
    got = {(r.row, r.col): r.n for r in sk.latest_state(spark, store).collect()}
    want = {
        (r.row, r.col): r.n
        for r in count_min_state(full, "item", depth=3, width=32).collect()
    }
    assert got == want


def test_transpile_protects_quoted_identifiers_in_second_pass():
    """'//' and bare VARCHAR inside double-quoted identifiers must
    survive (the rename pass already protected them; the operator/type
    pass must too)."""
    from sql4pandas_spark.functions.transpile import transpile_duckdb

    out = transpile_duckdb(
        'SELECT "a//b", "VARCHAR", x // 2 AS d, CAST(y AS VARCHAR) AS s FROM t'
    )
    # identifiers convert to Spark backticks (Spark reads "..." as a
    # string literal) with their contents byte-preserved
    assert "`a//b`" in out and "`VARCHAR`" in out
    assert " DIV " in out and "AS STRING" in out and "x //" not in out


# ------------------------------------- Bloom-prefiltered decontamination


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every member passes (the lossless-composition precondition); the
    false-positive rate at deliberately tight sizing stays within ~2x of
    the theoretical (1 - e^{-kn/m})^k."""
    import math

    from sql4pandas_spark.operators.sketches import bloom_build, bloom_contains

    n_bits, k, n = 63 * 64, 5, 500
    items = spark.createDataFrame([(f"w{i}",) for i in range(n)], ["s"])
    words = bloom_build(items, "s", n_bits=n_bits, k=k)
    assert items.filter(bloom_contains("s", words, n_bits=n_bits, k=k)).count() == n
    others = spark.createDataFrame([(f"x{i}",) for i in range(2000)], ["s"])
    fps = others.filter(bloom_contains("s", words, n_bits=n_bits, k=k)).count()
    theoretical = (1 - math.exp(-k * n / n_bits)) ** k
    assert fps > 0  # tight sizing MUST produce fps or the test is vacuous
    assert fps / 2000 < 2 * theoretical


def test_bloom_filters_merge_by_or(spark):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sketches import bloom_build

    items = spark.createDataFrame([(f"w{i}",) for i in range(300)], ["s"])
    full = bloom_build(items, "s", n_bits=63 * 32, k=4)
    h1 = bloom_build(items.filter(F.length("s") <= 2), "s", n_bits=63 * 32, k=4)
    h2 = bloom_build(items.filter(F.length("s") > 2), "s", n_bits=63 * 32, k=4)
    assert [a | b for a, b in zip(h1, h2)] == full


def test_bloom_prefiltered_contamination_equals_exact(spark):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.dedup import (
        bloom_prefiltered_contamination,
        contamination_overlap,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 20)
    cand = docs.filter(F.col("doc_id") >= 20)
    exact = {tuple(r) for r in contamination_overlap(cand, bench).collect()}
    # deliberately TIGHT bits so false positives flow into the verify
    # join and must be eliminated there
    bloom = {
        tuple(r)
        for r in bloom_prefiltered_contamination(
            cand, bench, n_bits=63 * 16, k=3
        ).collect()
    }
    assert bloom == exact and exact
