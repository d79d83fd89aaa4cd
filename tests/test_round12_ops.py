"""Round-12 pins: the four round-11 ADVICE transpiler divergences (empty
ranges, 3-arg regexp_replace, 2-arg regexp_extract, fractional epoch), the
fixpoint-shadowing fix that surfaced while closing them (an identity
pass-through edit must not hide nested registered calls forever), the
extended PII classes (Luhn-gated cards, mod-97-gated IBANs, secrets), the
list_reduce→aggregate mapping, the per-language bigram surprisal gate, the
vacuum/crash-replay interlock on both versioned stores, the NULL
contracts on the asof / range / interval joins, and the session-2 crawl
stations: per-domain boilerplate strip, chr(N) string_split separators,
the Gopher quality-rule gate, and line-preserving HTML extraction."""

from __future__ import annotations

import duckdb
import pytest

from sql4pandas_spark.functions.transpile import transpile_duckdb


def _both(spark, stmt: str):
    sp = [tuple(r) for r in spark.sql(transpile_duckdb(stmt)).collect()]
    dk = duckdb.sql(stmt).fetchall()
    return sp, dk


# --------------------------------------------- empty-range trap (ADVICE #2)

EMPTY_RANGE_CASES = [
    "SELECT range(0, 0) AS r",                      # the literal trap
    "SELECT range(5, 2) AS r",                      # descending span
    "SELECT range(2, 5) AS r",                      # normal
    "SELECT range(3) AS r",
    "SELECT range(0) AS r",                         # 1-arg empty
    "SELECT range(0, 10, 3) AS r",
    "SELECT range(0, 2, 3) AS r",                   # step overshoots
    "SELECT range(10, 2, -3) AS r",
    "SELECT range(2, 10, -3) AS r",                 # negative-step empty
    "SELECT generate_series(1, 0) AS r",            # inclusive empty
    "SELECT generate_series(1, 5) AS r",
    "SELECT generate_series(4) AS r",
    "SELECT generate_series(0, 10, 4) AS r",
    "SELECT generate_series(10, 0, -4) AS r",
    "SELECT generate_series(0, 10, -4) AS r",       # negative-step empty
]


@pytest.mark.parametrize("stmt", EMPTY_RANGE_CASES)
def test_range_empty_and_stepped_match_duckdb(spark, stmt):
    sp, dk = _both(spark, stmt)
    assert sp == dk, f"{stmt}: spark={sp} duckdb={dk}"


def test_range_on_expression_bound_hits_empty_case(spark):
    """The ADVICE repro shape: range(2, len(w)+1) over a 1-token list used
    to emit sequence(2, 1) = [2, 1] instead of []."""
    stmt = (
        "SELECT w, range(2, len(string_split(w, ' ')) + 1) AS r "
        "FROM (VALUES ('one'), ('two words here')) AS t(w) ORDER BY w"
    )
    sp, dk = _both(spark, stmt)
    assert sp == dk
    assert dk[0][1] == []  # the single-token row really is the empty case


def test_generate_series_interval_empty_spine_matches(spark):
    stmt = (
        "SELECT generate_series(TIMESTAMP '2024-01-02 00:00:00', "
        "TIMESTAMP '2024-01-01 00:00:00', INTERVAL 1 HOUR) AS r"
    )
    sp, dk = _both(spark, stmt)
    assert sp == dk == [([],)]


def test_generate_series_nonliteral_step_raises():
    with pytest.raises(ValueError, match="generate_series"):
        transpile_duckdb("SELECT generate_series(0, 9, n) AS r FROM t")


# ------------------------------------- 3-arg regexp_replace (ADVICE #1)

def test_regexp_replace_three_arg_raises_loudly():
    with pytest.raises(ValueError, match="first-occurrence"):
        transpile_duckdb("SELECT regexp_replace(s, 'a', 'X') AS x FROM t")


def test_regexp_replace_three_arg_nested_still_raises():
    with pytest.raises(ValueError, match="first-occurrence"):
        transpile_duckdb(
            "SELECT length(regexp_replace(s, 'a', 'X')) AS x FROM t"
        )


def test_regexp_replace_global_flag_still_rewrites(spark):
    stmt = "SELECT regexp_replace('aaa', 'a', 'X', 'g') AS x"
    assert "'g'" not in transpile_duckdb(stmt)
    sp, dk = _both(spark, stmt)
    assert sp == dk == [("XXX",)]


# ---------------------------------------- 2-arg regexp_extract (ADVICE #3)

def test_regexp_extract_two_arg_pins_group_zero(spark):
    # DuckDB default group is 0 (whole match); Spark's is 1 — unpinned,
    # this returned 'a' instead of 'ab'
    stmt = "SELECT regexp_extract('xaby', 'a(b)') AS x"
    sp, dk = _both(spark, stmt)
    assert sp == dk == [("ab",)]


def test_regexp_extract_explicit_group_untouched(spark):
    stmt = "SELECT regexp_extract('xaby', 'a(b)', 1) AS x"
    sp, dk = _both(spark, stmt)
    assert sp == dk == [("b",)]


# ------------------------------------------- fractional epoch (ADVICE #4)

def test_epoch_preserves_subsecond_precision(spark):
    stmt = "SELECT epoch(TIMESTAMP '2024-01-01 00:00:00.250') AS e"
    sp, dk = _both(spark, stmt)
    assert sp[0][0] == dk[0][0] == 1704067200.25


def test_epoch_whole_second_unchanged(spark):
    stmt = "SELECT epoch(TIMESTAMP '2024-06-15 12:30:00') AS e"
    sp, dk = _both(spark, stmt)
    assert float(sp[0][0]) == float(dk[0][0])


# ------------------------------- fixpoint shadowing (found fixing #4)

def test_nested_call_inside_passthrough_rewriter_is_rewritten(spark):
    """epoch(…) nested in a pass-through-shaped registered call
    (last_value without IGNORE NULLS) used to be shadowed by the outer
    identity edit on every fixpoint pass and never rewritten."""
    out = transpile_duckdb(
        "SELECT last_value(epoch(ts)) OVER (ORDER BY ts) AS e FROM t"
    )
    assert "unix_micros" in out and "epoch(" not in out


def test_nested_call_inside_ignore_nulls_struct_is_rewritten():
    """The gapfill oracle shape that caught the bug in the parity sweep."""
    out = transpile_duckdb(
        "SELECT last_value(CASE WHEN v IS NOT NULL THEN "
        "{'t': epoch(w), 'v': v} END IGNORE NULLS) OVER (ORDER BY w) AS x "
        "FROM t"
    )
    assert "unix_micros" in out and "epoch(" not in out
    assert out.count("IGNORE NULLS") == 1


# --------------------------------------- extended PII classes (round 12)

def test_pii_scrub_luhn_counts_but_redacts_all_card_shapes(spark):
    """Counts are Luhn-gated; redaction is conservative (every card-shaped
    candidate is replaced whether or not the checksum verifies)."""
    from sql4pandas_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "pay 4532015112830366 today"),           # Luhn-valid
            (2, "typo 4532015112830367 today"),          # Luhn-invalid
            (3, "spaced 4111 1111 1111 1111 ok"),        # valid, separators
            (4, "amex 3714 496353 98431 ok"),            # 15-digit valid
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["n_ccs"] == 1 and "<CC>" in rows[1]["text"]
    assert rows[2]["n_ccs"] == 0 and "<CC>" in rows[2]["text"]  # redacted anyway
    assert "4532015112830367" not in rows[2]["text"]
    assert rows[3]["n_ccs"] == 1 and "1111" not in rows[3]["text"]
    assert rows[4]["n_ccs"] == 1 and "<CC>" in rows[4]["text"]


def test_pii_scrub_iban_and_secret_shapes(spark):
    """IBAN counts are ISO 7064 mod-97-gated (letters in the BBAN map to
    their two-digit A=10..Z=35 expansion); redaction stays conservative
    for invalid shapes. Secrets cover prefixed keys and bare hex."""
    from sql4pandas_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "wire to DE89370400440532013000 please"),
            (2, "token key_A7fK2mQ9xP4wL8vB3n leaked"),
            (3, "hash c0ffee5ca1ab1efacade90d15ea5edeadbeef000 in log"),
            (4, "short key_abc and tiny beef00 are fine"),
            (5, "typo DE89370400440532013001 checksum fails"),
            (6, "letters GB82WEST12345698765432 valid"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["n_ibans"] == 1 and "<IBAN>" in rows[1]["text"]
    assert rows[2]["n_secrets"] == 1 and "<SECRET>" in rows[2]["text"]
    assert rows[3]["n_secrets"] == 1 and "c0ffee" not in rows[3]["text"]
    assert rows[4]["n_pii"] == 0 and "key_abc" in rows[4]["text"]
    assert rows[5]["n_ibans"] == 0 and "<IBAN>" in rows[5]["text"]  # redacted anyway
    assert rows[6]["n_ibans"] == 1 and "GB82" not in rows[6]["text"]


def test_pii_scrub_first_class_attribution_of_card_digits(spark):
    """A card number consumed by the ccs stage must not re-count as an
    IBAN/secret, and the IBAN's 18-digit tail must not pre-count as a
    card (no word boundary after the country code)."""
    from sql4pandas_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "acct DE89370400440532013000 card 4532015112830366")],
        "doc_id long, text string",
    )
    r = pii_scrub(df).collect()[0]
    assert (r["n_ccs"], r["n_ibans"], r["n_secrets"]) == (1, 1, 0)
    assert "<CC>" in r["text"] and "<IBAN>" in r["text"]


# ------------------------------------ bigram calibrated gate (round 12)

def test_bigram_gate_keeps_about_p75_per_language(spark):
    """Each language keeps ~75% of its own scored docs by construction of
    the per-language p75 threshold, and the thresholds genuinely differ
    across languages (a global threshold would collapse them)."""
    from sql4pandas_spark.queries.catalog import load_catalog

    build = load_catalog()["bigram_gate_per_lang"].build
    rows = build(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 2  # multiple languages scored
    for r in rows:
        frac = r["n_kept"] / r["n_docs"]
        assert 0.65 <= frac <= 0.85, f"{r['lang']}: kept {frac:.2f}"
    assert len({r["threshold_e6x4"] for r in rows}) > 1


# -------------------------- vacuum / crash-replay interlock (round 12)

def _seed_kv12(spark, root):
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    ).write.mode("overwrite").parquet(root + "/v0")


def test_vacuum_between_crash_and_replay_raises_interlock(spark, tmp_path):
    """vacuum_versions(keep_last=1) between a crash and its replayed drain
    removes the replay's SOURCE version; the replay must fail with the
    interlock named (cdc.py documents keep_last>=2 as the crash-replay
    floor), never merge onto the wrong base or die with a bare
    path-not-found."""
    import pytest as _pytest

    from sql4pandas_spark.streaming import cdc

    root = str(tmp_path / "snap")
    _seed_kv12(spark, root)
    changes = spark.createDataFrame(
        [(2, "b", 99, "update")], "k long, s string, v long, op string"
    )
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=0)   # commits v1
    # crash happens AFTER v1 is on disk but BEFORE the checkpoint commits;
    # an ill-timed retention sweep then drops v0
    assert cdc.vacuum_versions(root, keep_last=1) == [0]
    with _pytest.raises(RuntimeError, match="vacuum/replay interlock"):
        cdc.cdc_apply_batch(changes, root, ["k"], batch_id=0)  # the replay
    # the chain is still advanceable off the retained head
    cdc.cdc_apply_batch(
        spark.createDataFrame([(4, "d", 40, "insert")],
                              "k long, s string, v long, op string"),
        root, ["k"], batch_id=1,
    )
    assert sorted(
        tuple(r) for r in cdc.latest_snapshot(spark, root).collect()
    ) == [(1, "a", 10), (2, "b", 99), (3, "c", 30), (4, "d", 40)]


def test_vacuum_keep2_preserves_crash_replay(spark, tmp_path):
    """The documented contract: with keep_last=2 a post-crash replay still
    succeeds and is byte-identical to the first application."""
    from sql4pandas_spark.streaming import cdc

    root = str(tmp_path / "snap")
    _seed_kv12(spark, root)
    changes = spark.createDataFrame(
        [(2, "b", 99, "update")], "k long, s string, v long, op string"
    )
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=0)
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=1)  # v2
    assert cdc.vacuum_versions(root, keep_last=2) == [0]
    first = sorted(tuple(r) for r in spark.read.parquet(root + "/v2").collect())
    cdc.cdc_apply_batch(changes, root, ["k"], batch_id=1)  # replay of v1->v2
    again = sorted(tuple(r) for r in spark.read.parquet(root + "/v2").collect())
    assert first == again


def test_sketch_store_vacuum_replay_interlock(spark, tmp_path):
    """Same interlock on the additive sketch store, where a wrong-base
    merge would silently double-count."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sql4pandas_spark.streaming import sketches
    from sql4pandas_spark.streaming.cdc import vacuum_versions

    root = str(tmp_path / "hist")
    state = spark.createDataFrame([(0, 5), (1, 7)], "bin long, n long")
    sketches.seed_state(state, root)
    batch = spark.createDataFrame([(0, 2)], "bin long, n long")

    def merge(prev, cur):
        return (
            prev.unionByName(cur).groupBy("bin")
            .agg(F.sum("n").alias("n"))
        )

    sketches.sketch_apply_batch(batch, root, merge, batch_id=0)  # v1
    assert vacuum_versions(root, keep_last=1) == [0]
    with _pytest.raises(RuntimeError, match="vacuum/replay interlock"):
        sketches.sketch_apply_batch(batch, root, merge, batch_id=0)


# ------------------------------- asof NULL contract (round 12)

def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 10:00:00"),
            (2, "a", None),                      # NULL left ts
            (3, None, "2024-01-01 10:00:00"),    # NULL left key
            (4, "b", "2024-01-01 10:00:00"),     # key with only-NULL rights
        ],
        "id long, k string, ts string",
    ).selectExpr("id", "k", "CAST(ts AS TIMESTAMP) AS ts")
    right = spark.createDataFrame(
        [
            ("a", "2024-01-01 09:00:00", 100),
            ("a", None, 999),                    # NULL right ts
            (None, "2024-01-01 09:00:00", 888),  # NULL right key
            ("b", None, 777),
        ],
        "k string, ts string, v long",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_null_ts_and_null_key_never_match(spark, direction):
    """SQL semantics in every direction: NULL ts / NULL key rows never
    match on either side; left rows are all preserved. Pre-round-12, row 4
    got v=777 (NULL-ts leak through the ignorenulls carry), rows 2/3
    variously matched via the NULL window partition."""
    from sql4pandas_spark.operators.joins import asof_join

    left, right = _asof_fixture(spark)
    rows = {
        r["id"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction=direction,
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4}, "every left row must be preserved"
    expected_1 = 100 if direction in ("backward", "nearest") else None
    assert rows[1] == expected_1
    assert rows[2] is None  # NULL left ts
    assert rows[3] is None  # NULL left key
    assert rows[4] is None  # only NULL-ts rights on this key


def test_list_reduce_transpiles_to_aggregate(spark):
    """list_reduce (seedless fold) maps onto Spark aggregate with the
    first element as init; the [seed] || xs prepend idiom gives an
    explicit seed in shared syntax."""
    stmt = (
        "SELECT list_reduce([9, 1, 2, 3], (acc, x) -> acc * 10 + x) AS a, "
        "list_reduce([0] || range(1, 5), (acc, x) -> acc * 10 + x) AS b"
    )
    sp, dk = _both(spark, stmt)
    assert sp == dk == [(9123, 1234)]


def test_interval_overlap_join_drops_null_boundaries(spark):
    """NULL interval boundaries never match — correct BY CONSTRUCTION in
    the bucket-explosion formulation (sequence over a NULL epoch is NULL
    and explode emits no bucket rows), matching SQL inner-join
    comparison semantics. Pinned so a reformulation can't regress it."""
    from sql4pandas_spark.operators.joins import interval_overlap_join

    l = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
         (2, None, "2024-01-01 10:30:00"),
         (3, "2024-01-01 10:00:00", None)],
        "lid long, ls string, le string",
    ).selectExpr("lid", "CAST(ls AS TIMESTAMP) AS ls",
                 "CAST(le AS TIMESTAMP) AS le")
    r = spark.createDataFrame(
        [(10, "2024-01-01 10:15:00", "2024-01-01 10:45:00"),
         (11, None, None)],
        "rid long, rs string, re string",
    ).selectExpr("rid", "CAST(rs AS TIMESTAMP) AS rs",
                 "CAST(re AS TIMESTAMP) AS re")
    out = interval_overlap_join(l, r, "ls", "le", "rs", "re", 3600)
    assert sorted(
        (x["lid"], x["rid"]) for x in out.select("lid", "rid").collect()
    ) == [(1, 10)]


# ----------------------------- domain blocklist station (round 12)

def test_registered_domain_edge_cases(spark):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import registered_domain

    df = spark.createDataFrame(
        [
            (1, "https://News.Site.com/articles/9?id=2"),
            (2, "http://spam.bad-ads.net:8080/click"),
            (3, "blog.example.org/post"),          # schemeless
            (4, "localhost/admin"),                 # no dot -> NULL
            (5, "ftp://a.b.c.d.example.net/x"),    # deep subdomain
            (6, None),
        ],
        "id long, url string",
    )
    rows = {
        r["id"]: r["d"]
        for r in df.select("id", registered_domain(F.col("url")).alias("d")).collect()
    }
    assert rows[1] == "site.com"
    assert rows[2] == "bad-ads.net"
    assert rows[3] == "example.org"
    assert rows[4] is None
    assert rows[5] == "example.net"
    assert rows[6] is None


# -------------------------------- token entropy + stream scrub (round 12)

def test_token_entropy_known_values(spark):
    """Uniform repetition → 0; all-unique n tokens → ln(n); empty → NULL."""
    import math

    from sql4pandas_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "one two three four"),
            (3, ""),
            (4, "a a b b"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert rows[1]["entropy_e6"] == 0
    assert rows[2]["entropy_e6"] == int(round(math.log(4) * 1e6) * 4) // 4
    assert rows[3]["n_tokens"] == 0 and rows[3]["entropy_e6"] is None
    assert rows[4]["entropy_e6"] == int(round(2 * math.log(2) * 1e6) * 2) // 4


def test_stream_pii_totals_equal_batch_totals(spark):
    """The streaming scrub's store totals must equal the batch operator's
    aggregated counts — exactly-once over the 3-file drain."""
    from sql4pandas_spark.queries.catalog import load_catalog

    cat = load_catalog()
    stream_row = cat["stream_pii_scrub_counts"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    batch = cat["pii_scrub_documents"].build(
        spark, "/root/testdata/sf0.001"
    )
    from pyspark.sql import functions as F

    batch_row = batch.agg(
        *[F.sum(c).cast("long").alias(c) for c in stream_row.asDict() if c != "n_docs"],
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).collect()[0]
    assert stream_row.asDict() == batch_row.asDict()


# ------------------------------------------- per-domain boilerplate strip


def _bp_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, domain string, text string")


def test_strip_boilerplate_frequency_threshold(spark):
    """A line in 100% of a domain's docs goes; a line in 1/3 stays at
    min_pct=50; domains are scoped independently."""
    from sql4pandas_spark.operators.text import strip_boilerplate

    rows = [
        (1, "a.com", "NAV\nrare\nbody one"),
        (2, "a.com", "NAV\nbody two"),
        (3, "a.com", "NAV\nbody three"),
        # same NAV text on b.org appears in only 1 of 3 docs (33% < 50,
        # the threshold is >=) -> kept there; 'other' is 3/3 -> stripped
        (4, "b.org", "NAV\nother"),
        (5, "b.org", "footer\nother"),
        (6, "b.org", "header\nother"),
    ]
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            _bp_frame(spark, rows), min_pct=50, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "rare\nbody one"
    assert out[1]["n_lines_removed"] == 1
    assert out[4]["clean_text"] == "NAV"
    assert out[4]["n_lines_removed"] == 1
    assert out[5]["clean_text"] == "footer"
    assert out[6]["clean_text"] == "header"


def test_strip_boilerplate_within_doc_duplicates_all_removed(spark):
    """Per-doc distinct voting: a line repeated 3x in one doc votes once
    for the count, but once boilerplate, ALL copies are removed."""
    from sql4pandas_spark.operators.text import strip_boilerplate

    rows = [
        (1, "a.com", "AD\nx\nAD\ny\nAD"),
        (2, "a.com", "AD\nz"),
    ]
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            _bp_frame(spark, rows), min_pct=100, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "x\ny"
    assert out[1]["n_lines_removed"] == 3
    assert out[2]["clean_text"] == "z"


def test_strip_boilerplate_min_docs_and_null_domain(spark):
    """A domain below min_docs is never stripped, and NULL-domain docs
    pass through untouched (they join no decision row)."""
    from sql4pandas_spark.operators.text import strip_boilerplate

    rows = [
        (1, "solo.net", "NAV\nbody"),
        (2, None, "NAV\nbody"),
    ]
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            _bp_frame(spark, rows), min_pct=10, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "NAV\nbody"
    assert out[1]["n_lines_removed"] == 0
    assert out[2]["clean_text"] == "NAV\nbody"
    assert out[2]["n_lines_removed"] == 0


# ------------------------------- string_split chr(N) constant separators


def test_string_split_chr_separator_folds(spark):
    """chr(N) with an integer literal is a compile-time constant — the
    newline spelling every multi-line oracle needs (a raw newline can't
    sit inside a one-line SQL string). Regex metachar codepoints must be
    escaped like any literal separator."""
    cases = [
        "SELECT string_split('a' || chr(10) || 'b', chr(10)) AS r",
        "SELECT string_split('a.b.c', chr(46)) AS r",   # '.' must be quoted
        "SELECT string_split('x|y', chr(124)) AS r",    # '|' must be quoted
    ]
    for stmt in cases:
        sp, dk = _both(spark, stmt)
        assert sp == dk, f"{stmt}: spark={sp} duckdb={dk}"


def test_string_split_non_constant_separator_still_loud(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="string_split separator"):
        transpile_duckdb("SELECT string_split(a, b) FROM t")
    with _pytest.raises(ValueError, match="string_split separator"):
        transpile_duckdb("SELECT string_split(a, chr(n)) FROM t")


# ------------------------------------------------ Gopher quality-rule gate


def test_gopher_rules_known_values(spark):
    """Hand-built docs hit each rule exactly: degenerate short text,
    bullet-dominated, ellipsis-dominated, stopword-free, and one clean
    passing doc."""
    from sql4pandas_spark.operators.text import gopher_rules

    clean = (
        "the quick brown fox jumps over that lazy dog and then runs "
        "to be with all of them again today because every good line "
        "needs enough plain words to clear the floor easily in the end"
    )
    no_stop = " ".join(f"word{i:02d}" for i in range(40))
    bullets = clean + "".join(f"\n- item {i}" for i in range(30))
    ellipsis = clean + "\nwait...\nmore...\nsoon...\nlater...\nnever..."
    df = spark.createDataFrame(
        [
            (1, clean),
            (2, "aa bb"),
            (3, no_stop),
            (4, bullets),
            (5, ellipsis),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, min_words=30).collect()}
    assert out[1]["keep"]
    assert not out[2]["r_word_count"] and not out[2]["keep"]
    assert not out[3]["r_stopwords"]
    assert out[3]["r_word_count"] and out[3]["r_mean_word_len"]
    assert out[3]["r_alpha_words"]          # digits allowed, alpha present
    assert not out[4]["r_bullet_lines"] and out[4]["r_ellipsis_lines"]
    assert not out[5]["r_ellipsis_lines"] and out[5]["r_bullet_lines"]


def test_gopher_rules_extra_cols_passthrough(spark):
    """extra_cols carries input columns through unchanged and yields
    exactly what the old join-back formulation computed (the round-14
    optimization replaced a 1:1 self-join on doc_id with the
    passthrough; the gate columns themselves must not move)."""
    from sql4pandas_spark.operators.text import gopher_rules

    clean = (
        "the quick brown fox jumps over that lazy dog and then runs "
        "to be with all of them again today because every good line "
        "needs enough plain words to clear the floor easily in the end"
    )
    df = spark.createDataFrame(
        [(1, "en", clean), (2, "de", "aa bb"), (3, "fr", clean + " extra")],
        "doc_id long, lang string, text string",
    )
    through = gopher_rules(df, min_words=30, extra_cols=("lang",))
    joined = df.select("doc_id", "lang").join(
        gopher_rules(df, min_words=30), "doc_id"
    ).select(*through.columns)
    assert through.columns[:3] == ["doc_id", "lang", "n_words"]
    assert sorted(map(tuple, through.collect())) == sorted(
        map(tuple, joined.collect())
    )
    # default stays column-identical to the pre-change contract
    assert gopher_rules(df, min_words=30).columns[0:2] == [
        "doc_id", "n_words",
    ]


def test_gopher_rules_integer_threshold_edges(spark):
    """The exact cross-multiplied boundaries: mean word length exactly 3
    and exactly 10 pass (inclusive); alpha fraction exactly 0.8 fails
    (strict >)."""
    from sql4pandas_spark.operators.text import gopher_rules

    mean3 = " ".join(["abc"] * 40)           # mean exactly 3
    mean10 = " ".join(["abcdefghij"] * 40)   # mean exactly 10
    mean11 = " ".join(["abcdefghijk"] * 40)  # mean 11 -> fail
    alpha45 = " ".join(["word"] * 32 + ["1234"] * 8)  # 32/40 = 0.8 exactly
    df = spark.createDataFrame(
        [(1, mean3), (2, mean10), (3, mean11), (4, alpha45)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, min_words=30).collect()}
    assert out[1]["r_mean_word_len"] and out[2]["r_mean_word_len"]
    assert not out[3]["r_mean_word_len"]
    assert not out[4]["r_alpha_words"]  # exactly 80% is not > 80%


# ---------------------------------------------------- HTML text extraction


def test_html_to_text_known_values(spark):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import html_to_text

    cases = [
        (1, "<p>hello <b>world</b></p>", "hello world"),
        # script body with a bare '<' must vanish entirely, not poison
        # the tag strip
        (2, "a<script>if (1 < 2) x();</script>b", "a b"),
        (3, "<style>p {color:red}</style>text", "text"),
        (4, "<head><title>t</title></head><body>x</body>", "x"),
        (5, "one<!-- note -->two", "one two"),
        # one-level entity decode: &amp;lt; -> &lt;  but &lt; -> <
        (6, "&amp;lt;keep&amp;gt; &lt;i&gt;", "&lt;keep&gt; <i>"),
        (7, "a&nbsp;b &quot;q&quot; &#39;s&#39;", "a b \"q\" 's'"),
        # newline runs collapse to ONE newline (line structure preserved),
        # horizontal runs to one space
        (8, "  spaced\n\n\tout  ", "spaced\nout"),
        (9, "<SCRIPT>x</SCRIPT><STYLE>y</STYLE>z", "z"),  # case-insensitive
        # block closers become line breaks — the structure the line-based
        # boilerplate strip downstream depends on
        (10, "<p>a</p><p>b</p><ul><li>c</li></ul>d<br>e", "a\nb\nc\nd\ne"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], "id long, html string"
    )
    got = {
        r["id"]: r["t"]
        for r in df.select("id", html_to_text(F.col("html")).alias("t")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


# ----------------------------------------------------- integer PageRank


def test_pagerank_hand_computed_round(spark):
    """One round over a 3-node graph, every floor division checked by
    hand: N=3, init 333,333,333, base 50,000,000; b collects both other
    nodes' full contributions."""
    from sql4pandas_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("c", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: r["rank_e9"] for r in pagerank(edges, iterations=1).collect()}
    assert got == {
        "a": 50_000_000 + 85 * 333_333_333 // 100,
        "b": 50_000_000 + 85 * (333_333_333 + 333_333_333) // 100,
        "c": 50_000_000,
    }


def test_pagerank_two_node_cycle_is_fixed_point(spark):
    """A symmetric 2-cycle sits exactly at the update's fixed point
    (5e8 = 75e6 + 85·5e8//100), so any number of iterations returns the
    uniform rank unchanged — pins that no mass leaks on the happy path."""
    from sql4pandas_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: r["rank_e9"] for r in pagerank(edges, iterations=4).collect()}
    assert got == {"a": 500_000_000, "b": 500_000_000}


def test_pagerank_empty_graph(spark):
    from sql4pandas_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, iterations=3).count() == 0


# ----------------------------------------------------- BPE merge training


def test_bpe_learn_merges_iterates_on_merged_corpus(spark):
    """Round 2 must count the MERGED corpus: after (a,b)→ab, the pair
    (ab, c) exists only post-merge, and round 3's winner contains two
    prior merges."""
    from sql4pandas_spark.operators.text import bpe_learn_merges

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "ab c ab c")],
        "doc_id long, text string",
    )
    assert bpe_learn_merges(df, n_merges=3) == [
        ("a", "b", 3),
        ("ab", "c", 3),
        ("ab", "abc", 1),
    ]


def test_bpe_merge_tokens_is_greedy_left_to_right(spark):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import bpe_merge_tokens

    df = spark.createDataFrame(
        [(1, ["a", "a", "a"]), (2, ["a", "a", "a", "a"]), (3, ["b"])],
        "id long, w array<string>",
    )
    got = {
        r["id"]: list(r["m"])
        for r in df.select(
            "id", bpe_merge_tokens(F.col("w"), "a", "a").alias("m")
        ).collect()
    }
    assert got[1] == ["aa", "a"]
    assert got[2] == ["aa", "aa"]
    assert got[3] == ["b"]


def test_bpe_tie_break_and_alphabet_filter(spark):
    """Equal-count pairs resolve lexicographically, and tokens outside
    the lowercase-alnum alphabet never enter the training corpus."""
    from sql4pandas_spark.operators.text import bpe_learn_merges

    df = spark.createDataFrame(
        [(1, "z y"), (2, "b a"), (3, "<tag> b a !!")],
        "doc_id long, text string",
    )
    # 'b a' appears twice (doc 2 and doc 3 with markup dropped), 'z y' once
    assert bpe_learn_merges(df, n_merges=1) == [("b", "a", 2)]
    df2 = spark.createDataFrame(
        [(1, "z y"), (2, "b a")], "doc_id long, text string"
    )
    # one count each -> lexicographically smaller pair 'b a' wins
    assert bpe_learn_merges(df2, n_merges=1)[0][:2] == ("b", "a")


def test_incremental_boilerplate_threshold_flip(spark):
    """The cumulative vote state must FLIP a decision between batches: a
    banner rare in batch 1 (kept there) crosses the frequency threshold
    once batch 2's votes land, so batch 2's copies are stripped while
    batch 1's documents keep theirs — frequencies, not fixed lists."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import (
        BOILERPLATE_STATE_SCHEMA,
        boilerplate_votes,
        merge_boilerplate_votes,
        strip_boilerplate_with_state,
    )
    from sql4pandas_spark.streaming import sketches

    rows = (
        # batch 1 (ids 0-9): banner only in doc 0 -> 10% < 50%
        [(0, "a.com", "BANNER\nbody-0")]
        + [(i, "a.com", f"body-{i}") for i in range(1, 10)]
        # batch 2 (ids 10-19): banner in 9 of 10 -> cumulative 50% >= 50%
        + [(i, "a.com", f"BANNER\nbody-{i}") for i in range(10, 19)]
        + [(19, "a.com", "body-19")]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    b1 = df.filter(F.col("doc_id") < 10)
    b2 = df.filter(F.col("doc_id") >= 10)
    import tempfile

    root = tempfile.mkdtemp(prefix="bp_flip_")
    sketches.empty_state(spark, BOILERPLATE_STATE_SCHEMA, root)
    sketches.sketch_apply_batch(
        boilerplate_votes(b1), root, merge_boilerplate_votes, 0
    )
    s1 = spark.read.parquet(f"{root}/v1")
    out1 = {
        r["doc_id"]: r["clean_text"]
        for r in strip_boilerplate_with_state(b1, s1, min_pct=50).collect()
    }
    assert out1[0] == "BANNER\nbody-0"  # 10% — kept in batch 1
    sketches.sketch_apply_batch(
        boilerplate_votes(b2), root, merge_boilerplate_votes, 1
    )
    s2 = spark.read.parquet(f"{root}/v2")
    out2 = {
        r["doc_id"]: r["clean_text"]
        for r in strip_boilerplate_with_state(b2, s2, min_pct=50).collect()
    }
    assert out2[10] == "body-10"  # cumulative 50% — stripped in batch 2
    assert out2[19] == "body-19"
