"""Round-11 operator tests: the three round-10 ADVICE fixes (string_split
separator semantics, comment masking in the transpiler, deterministic
weighted-sample merge) plus the round's new operators as they land."""

from __future__ import annotations

import duckdb
import pytest

from sql4pandas_spark.functions.transpile import transpile_duckdb

# --------------------------------------------- ADVICE: string_split rewrite


def test_string_split_regex_metachar_separator(spark):
    """DuckDB string_split splits on a LITERAL separator; Spark split takes
    a Java regex. A '.' or '|' separator must be regex-escaped or the
    transpiled statement silently splits on everything."""
    stmt = "SELECT string_split(s, '.') AS parts FROM (SELECT 'a.b.c' AS s)"
    duck = duckdb.connect().execute(stmt).fetchone()[0]
    got = spark.sql(transpile_duckdb(stmt)).collect()[0]["parts"]
    assert list(got) == list(duck) == ["a", "b", "c"]

    stmt2 = "SELECT string_split(s, '|') AS parts FROM (SELECT 'x|y' AS s)"
    duck2 = duckdb.connect().execute(stmt2).fetchone()[0]
    got2 = spark.sql(transpile_duckdb(stmt2)).collect()[0]["parts"]
    assert list(got2) == list(duck2) == ["x", "y"]


def test_string_split_quote_and_backslash_separators(spark):
    """Separators containing the two escaping-scheme trouble chars (' and
    backslash) round-trip: the emitted Spark literal uses '' doubling for
    quotes (parseable by both Spark and this module's own tokenizer) and
    doubled backslashes."""
    stmt = (
        "SELECT string_split(s, '''') AS parts, x // 2 AS d "
        "FROM (SELECT 'a''b' AS s, 5 AS x)"
    )
    duck = duckdb.connect().execute(stmt).fetchone()[0]
    out = transpile_duckdb(stmt)
    assert " DIV " in out  # second pass stayed in sync after the literal
    got = spark.sql(out).collect()[0]["parts"]
    assert list(got) == list(duck) == ["a", "b"]

    # data built via chr(92) because a backslash inside a plain literal
    # parses differently in the two engines (Spark escape vs DuckDB raw)
    stmt2 = (
        r"SELECT string_split(s, '\') AS parts "
        "FROM (SELECT concat('p', chr(92), 'q') AS s)"
    )
    duck2 = duckdb.connect().execute(stmt2).fetchone()[0]
    got2 = spark.sql(transpile_duckdb(stmt2)).collect()[0]["parts"]
    assert list(got2) == list(duck2) == ["p", "q"]


def test_string_split_non_literal_separator_rejected():
    with pytest.raises(ValueError, match="string_split separator"):
        transpile_duckdb("SELECT string_split(s, sep_col) FROM t")
    with pytest.raises(ValueError, match="string_split separator"):
        transpile_duckdb("SELECT string_split(s, upper('.')) FROM t")


def test_string_split_nested_and_protected_occurrences():
    # nested in first arg: both calls rewritten, inner first
    out = transpile_duckdb(
        "SELECT string_split(array_to_string(string_split(s, '.'), '-'), '-') FROM t"
    )
    assert "string_split" not in out
    assert out.count("split(") >= 2 and r"'\\.'" in out
    # inside a comment / literal: untouched
    out2 = transpile_duckdb(
        "SELECT 'string_split(a, ''.'')' AS lit -- string_split(b, '.')\n FROM t"
    )
    assert "'string_split(a, ''.'')'" in out2
    assert "-- string_split(b, '.')" in out2


# --------------------------------------------- ADVICE: comment masking


def test_transpile_comment_with_apostrophe_does_not_desync():
    """An apostrophe inside a comment must not flip string-literal
    tracking: renames and the second pass still apply after it, and real
    literals after the comment stay protected."""
    out = transpile_duckdb(
        "SELECT len(xs) AS n -- it's a note\n"
        ", power(x, 2) AS p, 'len(q)' AS lit, y // 3 AS d FROM t"
    )
    assert "size(xs)" in out and "pow(x, 2)" in out
    assert "'len(q)'" in out and "DIV" in out and "// 3" not in out
    assert "-- it's a note" in out  # comment text untouched


def test_transpile_block_comment_masked():
    out = transpile_duckdb(
        "SELECT /* don't rename len(a) or a // b here */ len(b) AS n, "
        "c // 2 AS d FROM t"
    )
    assert "/* don't rename len(a) or a // b here */" in out
    assert "size(b)" in out and "DIV" in out and "// 2" not in out


# ----------------------------------- ADVICE: deterministic weighted merge


def test_merge_weighted_samples_conflicting_weight_deterministic(spark):
    """Same id with DIFFERENT weight/skey across batch states: the merged
    sample must keep the max-skey row regardless of state order (the old
    dropDuplicates([id]) kept whichever state happened to come first)."""
    from sql4pandas_spark.operators.sampling import (
        merge_weighted_samples,
        weighted_sample_topk,
    )

    rows_a = [(f"d{i}", float(i + 1)) for i in range(30)]
    rows_b = [(f"d{i}", float(2 * (i + 1))) for i in range(30)]  # reweighted
    a = weighted_sample_topk(
        spark.createDataFrame(rows_a, "doc_id string, w double"),
        k=10, weight_col="w",
    )
    b = weighted_sample_topk(
        spark.createDataFrame(rows_b, "doc_id string, w double"),
        k=10, weight_col="w",
    )
    ab = [tuple(r) for r in merge_weighted_samples([a, b], k=10).collect()]
    ba = [tuple(r) for r in merge_weighted_samples([b, a], k=10).collect()]
    assert ab == ba
    # survivor per id is the max-skey observation
    kept = {r[0]: r for r in ab}
    a_rows = {r["doc_id"]: r for r in a.collect()}
    b_rows = {r["doc_id"]: r for r in b.collect()}
    for doc_id, row in kept.items():
        cands = [x for x in (a_rows.get(doc_id), b_rows.get(doc_id)) if x]
        assert row[-1] == max(c["skey"] for c in cands)


# ------------------------------- round-11 NULL/NaN load-bearing contracts


def _planted(spark):
    from sql4pandas_spark.queries.pipeline import _events_with_nulls

    return _events_with_nulls(spark, "/root/testdata/sf0.001")


def test_planted_frame_actually_carries_nulls_and_nans(spark):
    """The null-contract entries are only load-bearing if the planted
    frame really feeds NULLs/NaNs through — pin the plant itself."""
    from pyspark.sql import functions as F

    ev = _planted(spark)
    agg = ev.agg(
        F.sum(F.col("user_id").isNull().cast("int")).alias("nu"),
        F.sum(F.col("ts").isNull().cast("int")).alias("nt"),
        F.sum(F.col("event_type").isNull().cast("int")).alias("ne"),
        F.sum(F.isnan("value").cast("int")).alias("nn"),
        F.sum(F.col("value").isNull().cast("int")).alias("nv"),
    ).collect()[0]
    assert min(agg) > 0, f"planting produced no NULL/NaN somewhere: {agg}"


def test_value_histogram_nan_guard_is_load_bearing(spark):
    """Without ~isnan, every planted NaN would land in the TOP bin:
    the histogram total must equal the count of non-null non-NaN values,
    strictly less than the count of non-null values."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sketches import value_histogram

    ev = _planted(spark)
    hist_total = (
        value_histogram(ev, "value", lo=0.0, hi=400.0, n_bins=16)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    n_nonnull = ev.filter(F.col("value").isNotNull()).count()
    n_clean = ev.filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).count()
    assert hist_total == n_clean < n_nonnull


def test_sessionize_null_drops_are_load_bearing(spark):
    """Sessionized event mass must equal exactly the stamped+identified
    subset — if the operator stopped dropping NULL user/ts rows, the
    totals would include them and diverge."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.behavior import sessionize

    ev = _planted(spark)
    total = (
        sessionize(ev).agg(F.sum("n_events")).collect()[0][0]
    )
    keepable = ev.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).count()
    assert total == keepable < ev.count()


def test_top_movers_null_group_flows_through(spark):
    """A NULL event_type is a real group: top_movers must emit rows for
    it when its buckets are calendar-adjacent, same as any group."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.behavior import top_movers

    ev = _planted(spark)
    out = top_movers(ev, "event_type")
    assert out.filter(F.col("event_type").isNull()).count() > 0


# ----------------------------------------- round-11 IVF cache lifecycle


def _storage_frames(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_ivf_cache_drop_releases_storage(spark):
    """build -> drop cycles must leave executor storage flat: each cached
    index persists one assignment frame, and drop_ivf_index unpersists."""
    from sql4pandas_spark.operators.similarity import (
        _IVF_CACHE,
        build_ivf_index,
        drop_ivf_index,
    )
    from sql4pandas_spark.sources.parquet import register_tables

    t = register_tables(spark, "/root/testdata/sf0.001", ("embeddings",))
    drop_ivf_index()  # clean slate
    base = _storage_frames(spark)
    for cycle in range(3):
        idx = build_ivf_index(
            t["embeddings"], n_cells=4, cache_key=f"r11_cycle_{cycle}"
        )
        idx.assigned.count()  # materialize the persist
        assert _storage_frames(spark) >= base + 1
        assert drop_ivf_index(cache_key=f"r11_cycle_{cycle}") == 1
        assert _storage_frames(spark) == base
    assert all(k[1] != "r11_cycle_2" for k in _IVF_CACHE)


def test_ivf_cache_is_lru_bounded(spark):
    """Entry max+1 evicts (and releases) the least recently used index."""
    from sql4pandas_spark.operators import similarity as sim
    from sql4pandas_spark.sources.parquet import register_tables

    t = register_tables(spark, "/root/testdata/sf0.001", ("embeddings",))
    sim.drop_ivf_index()
    base = _storage_frames(spark)
    keys = [f"r11_lru_{i}" for i in range(sim._IVF_CACHE_MAX + 2)]
    built = {k: sim.build_ivf_index(t["embeddings"], n_cells=4, cache_key=k)
             for k in keys}
    for k in keys:
        built[k].assigned.count()
    assert len(sim._IVF_CACHE) == sim._IVF_CACHE_MAX
    cached_keys = [k[1] for k in sim._IVF_CACHE]
    assert keys[0] not in cached_keys and keys[1] not in cached_keys
    assert keys[-1] in cached_keys
    # a cache HIT refreshes recency: touch the oldest survivor, add one
    # more, and the second-oldest (not the touched one) must evict
    survivor = cached_keys[0]
    sim.build_ivf_index(t["embeddings"], n_cells=4, cache_key=survivor)
    sim.build_ivf_index(t["embeddings"], n_cells=4, cache_key="r11_lru_extra")
    now = [k[1] for k in sim._IVF_CACHE]
    assert survivor in now and cached_keys[1] not in now
    assert sim.drop_ivf_index() == sim._IVF_CACHE_MAX
    assert _storage_frames(spark) == base


# ------------------------------- round-11 public components labeler


def test_label_components_singletons_and_chains(spark):
    """label_components: chain {1-2-3} merges to min id, pair {10-11}
    likewise, and node 99 (no edges) keeps its own id — the singleton
    coalesce that bare connected_components does not do."""
    from sql4pandas_spark.operators.dedup import label_components

    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in label_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_label_components_nonconvergence_raises(spark):
    """A chain longer than max_iter must raise, never silently
    under-merge."""
    import pytest as _pytest

    from sql4pandas_spark.operators.dedup import label_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        label_components(nodes, chain, max_iter=2)


def test_connected_components_sum_convergence_check(spark):
    """The r14 convergence check compares exact decimal label sums across
    rounds (min-propagation is elementwise monotone non-increasing, so an
    unchanged sum proves a fixpoint). Pin the cases the check must not
    confuse: an empty pair set terminates immediately with empty labels,
    and a deep chain (diameter > 1) still fully merges — a premature
    'converged' would leave mid-chain labels unmerged."""
    from sql4pandas_spark.operators.dedup import connected_components

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(chain).collect()}
    assert got == {i: 0 for i in range(10)}

    # non-numeric ids take the join-based fallback — same labels
    schain = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(4)], "id_a string, id_b string"
    )
    sgot = {r["doc_id"]: r["cluster_id"] for r in connected_components(schain).collect()}
    assert sgot == {f"n{i}": "n0" for i in range(5)}


# ------------------------------------ round-11 versioned-store retention


def test_vacuum_versions_lifecycle(spark, tmp_path):
    """Vacuum deletes old versions on disk, retained time travel still
    answers, vacuumed reads raise, and the chain advances afterward —
    for BOTH store layouts (CDC snapshot and sketch state share v{k})."""
    import os

    import pytest as _pytest

    from sql4pandas_spark.streaming import cdc

    root = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, x long"
    )
    cdc.seed_snapshot(base, root)
    for bid in range(3):
        changes = spark.createDataFrame(
            [(bid, 777 + bid, "update")], "k long, x long, op string"
        )
        cdc.cdc_apply_batch(changes, root, ["k"], batch_id=bid)
    assert cdc._versions(root) == [0, 1, 2, 3]

    assert cdc.vacuum_versions(root, keep_last=2) == [0, 1]
    assert cdc._versions(root) == [2, 3]
    assert not os.path.exists(os.path.join(root, "v0"))

    # retained time travel: v2 has batches 0,1 applied but not 2
    v2 = {r["k"]: r["x"] for r in cdc.snapshot_at(spark, root, 2).collect()}
    assert v2[0] == 777 and v2[1] == 778 and v2[2] == 20

    with _pytest.raises(FileNotFoundError, match="vacuum"):
        cdc.snapshot_at(spark, root, 1)
    with _pytest.raises(ValueError, match="keep_last"):
        cdc.vacuum_versions(root, keep_last=0)

    # chain still advances; replay of the head batch also still works
    changes = spark.createDataFrame([(5, 999, "update")], "k long, x long, op string")
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=3)
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=3)  # crash replay
    assert cdc._versions(root) == [2, 3, 4]

    # keep_last=1 between drains: head-only store keeps advancing
    assert cdc.vacuum_versions(root, keep_last=1) == [2, 3]
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=4)
    assert cdc._versions(root) == [4, 5]


def test_transpile_cast_unnest_param_interval_ignore_nulls(spark):
    """The late-round dialect rewrites: cast pushed inside the array
    (generators are top-level-only in Spark), parameterized intervals,
    and in-parens IGNORE NULLS."""
    out = transpile_duckdb("SELECT CAST(unnest(range(0, 3)) AS INT) AS b")
    assert [r["b"] for r in spark.sql(out).collect()] == [0, 1, 2]

    out2 = transpile_duckdb(
        "SELECT TIMESTAMP '2024-01-01' + INTERVAL (7 % 4) MINUTE AS t"
    )
    assert "make_dt_interval(0, 0, (7 % 4), 0)" in out2
    assert str(spark.sql(out2).collect()[0]["t"]) == "2024-01-01 00:03:00"
    # literal intervals are shared syntax: untouched
    assert "INTERVAL 15 MINUTE" in transpile_duckdb(
        "SELECT ts + INTERVAL 15 MINUTE FROM t"
    )

    out3 = transpile_duckdb(
        "SELECT last_value(x IGNORE NULLS) OVER (ORDER BY i) AS lv "
        "FROM (SELECT 1 AS i, 10 AS x UNION ALL SELECT 2, NULL)"
    )
    assert "last_value(x) IGNORE NULLS" in out3
    assert [r["lv"] for r in spark.sql(out3).collect()] == [10, 10]


def test_transpile_string_literal_bracket_passthrough(spark):
    """A string-literal key rides Spark's own bracket accessor — struct
    field access AND map lookup (NULL on missing, like DuckDB); only
    non-literal indexes become try_element_at."""
    out = transpile_duckdb("SELECT ({'pos': 4, 'gram': 'g'})['pos'] AS p")
    assert "try_element_at" not in out
    assert spark.sql(out).collect()[0]["p"] == 4
    out2 = transpile_duckdb("SELECT xs[i] FROM t")
    assert "try_element_at(xs, i)" in out2


def test_transpiled_statement_plans_like_native_sql(spark):
    """A transpiled reference-dialect statement must optimize like
    hand-written Spark SQL: q6's filters reach the parquet scan
    (PushedFilters) and the scan reads only the four referenced columns
    — no wrapper nodes, no pushdown loss through the front end."""
    from sql4pandas_spark.queries.catalog import load_catalog
    from sql4pandas_spark.sources.parquet import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    oracle = load_catalog()["q6_forecast_revenue"].oracle
    plan = (
        spark.sql(transpile_duckdb(oracle))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
    # column pruning: exactly the four referenced lineitem columns
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in scan
    assert "l_orderkey" not in scan and "l_comment" not in scan


def test_bigram_backoff_is_load_bearing(spark):
    """Held-out docs must hit the backoff path (n_backoff > 0 somewhere),
    reference docs scored on their own counts must not, and every
    surprisal is non-negative (c(p,w) <= c(p) when seen)."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import bigram_backoff_surprisal
    from sql4pandas_spark.sources.parquet import register_tables

    t = register_tables(spark, "/root/testdata/sf0.001", ("documents",))
    docs = t["documents"]
    ref = docs.filter(F.col("doc_id") % 3 != 0)
    out = bigram_backoff_surprisal(docs, ref)
    held = out.filter(F.col("doc_id") % 3 == 0)
    assert held.agg(F.sum("n_backoff")).collect()[0][0] > 0
    in_ref = out.filter(F.col("doc_id") % 3 != 0)
    assert in_ref.agg(F.sum("n_backoff")).collect()[0][0] == 0
    assert out.filter(F.col("surprisal_sum_e6") < 0).count() == 0


def test_bigram_backoff_exact_values_through_checkpointed_counts(spark):
    """Exact e6 surprisal values through all three unigram-count
    consumers (the (N,V) normalizer and both count joins now read ONE
    materialized frame — round-14): seen bigram scores ln(c(p)/c(p,w)),
    backoff scores ln((N+V)/(alpha*(c(w)+1))), each e6-rounded once."""
    import math

    from sql4pandas_spark.operators.text import bigram_backoff_surprisal

    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")],
        "doc_id long, text string",
    )
    # ref unigrams: a=3, b=3, c=1 -> N=7, V=3; bigrams: (a,b)=3, (b,a)=1,
    # (b,c)=1
    score = spark.createDataFrame(
        [(10, "a b c d")], "doc_id long, text string"
    )
    row = bigram_backoff_surprisal(score, ref).collect()[0]
    s_ab = round(math.log(3 / 3) * 1e6)          # seen: c(a)=3, c(a,b)=3
    s_bc = round(math.log(3 / 1) * 1e6)          # seen: c(b)=3, c(b,c)=1
    s_cd = round(math.log((7 + 3) / (0.4 * (0 + 1))) * 1e6)  # backoff, c(d)=0
    assert row["n_bigrams"] == 3 and row["n_backoff"] == 1
    assert row["surprisal_sum_e6"] == s_ab + s_bc + s_cd
    assert row["avg_surprisal_e6"] == (s_ab + s_bc + s_cd) // 3


def test_bigram_backoff_degenerate_text_scores_high(spark):
    """'the the the ...' is cheap under unigrams but must be expensive
    under bigrams when the reference never repeats tokens."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import bigram_backoff_surprisal

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over lazy dogs") for i in range(5)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "the the the the")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_backoff_surprisal(score, ref).collect()}
    assert rows[100]["n_backoff"] == 0  # all bigrams seen, p(w|prev)=1
    assert rows[100]["avg_surprisal_e6"] == 0
    assert rows[101]["n_backoff"] == 3  # 'the the' never seen in ref
    assert rows[101]["avg_surprisal_e6"] > 0


def test_pii_scrub_stagewise_attribution(spark):
    """Overlapping classes attribute to the FIRST stage: an email whose
    host is an IP scrubs as one email, zero IPs; standalone instances of
    each class count and scrub independently."""
    from sql4pandas_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            # the IP-looking string sits INSIDE the email host: the email
            # stage scrubs it first, so the IP stage must count zero
            (1, "mail me at bob@10.0.0.1.example.com thanks"),
            (2, "server 192.168.1.1 and ssn 123-45-6789 and 555-123-4567"),
            (3, "clean text, nothing to see"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ips"] == 0
    assert "<EMAIL>" in rows[1]["text"] and "10.0.0.1" not in rows[1]["text"]
    r2 = rows[2]
    assert (r2["n_ips"], r2["n_ssns"], r2["n_phones"]) == (1, 1, 1)
    assert "<IP>" in r2["text"] and "<SSN>" in r2["text"] and "<PHONE>" in r2["text"]
    assert r2["n_pii"] == 3
    assert rows[3]["n_pii"] == 0 and rows[3]["text"] == "clean text, nothing to see"


def test_transpile_comparison_against_list_rejected_loudly():
    """`x > [1]` cannot be classified (a '>' before a bracket is only an
    access base when it closes an ARRAY<...> type) — must raise, never
    emit a garbled base expression."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cannot determine the access base"):
        transpile_duckdb("SELECT 1 FROM t WHERE x > [1, 2]")
    # the legitimate '>' base still works: DOUBLE[][] nests fine
    out = transpile_duckdb("SELECT CAST(e AS DOUBLE[][]) FROM t")
    assert "ARRAY<ARRAY<DOUBLE>>" in out
