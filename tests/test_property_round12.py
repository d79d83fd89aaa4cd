"""Round-12 transpiler properties: (1) semantic stability under
re-transpilation — ``transpile(transpile(x))`` must compute the same values
as ``transpile(x)`` on Spark, catching double-rewrites of emitted
literals/brackets/suffixes; (2) grammar extensions for the constructs the
round-11 fuzzer didn't reach: parameterized intervals, fractional epoch,
and the empty-range guard on range/generate_series. Derandomized like the
other property files.

The stability property is scoped to emitted text WITHOUT backslashes: the
final literal-escaping pass intentionally doubles raw backslashes (DuckDB
literals are raw, Spark's are escaped), so a Spark-form literal containing
``\\`` is re-escaped again on a second pass by design — that pass is a
dialect conversion, not a normal form.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sql4pandas_spark.functions.transpile import transpile_duckdb

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=30,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ints = st.integers(min_value=-9, max_value=9)
small = st.integers(min_value=1, max_value=6)


@st.composite
def _empty_range_len(draw):
    """len(range(a, b)) / len(generate_series(a, b)) over ARBITRARY bound
    pairs — the empty case (b <= a / b < a) is generated about half the
    time, exactly the trap the round-11 ADVICE found."""
    a, b = draw(ints), draw(ints)
    if draw(st.booleans()):
        return f"len(range({a}, {b}))", max(0, b - a)
    return f"len(generate_series({a}, {b}))", max(0, b - a + 1)


@st.composite
def _stepped_range_sum(draw):
    a = draw(st.integers(min_value=-5, max_value=5))
    b = draw(st.integers(min_value=-5, max_value=5))
    s = draw(st.sampled_from([-3, -2, -1, 1, 2, 3]))
    vals = list(range(a, b, s))
    return f"list_sum(range({a}, {b}, {s}))", (sum(vals) if vals else None)


@st.composite
def _param_interval_epoch(draw):
    """epoch(ts + INTERVAL (k) UNIT) — exercises the parameterized-interval
    rewrite composed with the new exact-DOUBLE epoch mapping."""
    k = draw(st.integers(min_value=0, max_value=40))
    unit, secs = draw(
        st.sampled_from([("HOUR", 3600), ("MINUTE", 60), ("SECOND", 1)])
    )
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    return (
        f"epoch(TIMESTAMP '2024-01-01 00:00:00' + INTERVAL ({k}) {unit})",
        base + k * secs,
    )


@st.composite
def _list_reduce_fold(draw):
    """list_reduce over a seeded fold — the round-12 aggregate mapping,
    with the [seed] || xs prepend idiom and an arbitrary affine step."""
    xs = draw(st.lists(st.integers(min_value=0, max_value=9),
                       min_size=1, max_size=5))
    k = draw(st.integers(min_value=1, max_value=4))
    lit = "[" + ", ".join(str(x) for x in xs) + "]"
    acc = 0
    for x in xs:
        acc = acc * k + x
    return (
        f"list_reduce([0] || {lit}, (acc, x) -> acc * {k} + x)",
        acc,
    )


@st.composite
def _frac_epoch(draw):
    ms = draw(st.integers(min_value=0, max_value=999))
    return (
        f"1000 * epoch(TIMESTAMP '2024-01-01 00:00:00.{ms:03d}')",
        1704067200000 + ms,
    )


@st.composite
def _chr_split_and_affix(draw):
    """string_split with a chr(N) constant separator (incl. regex
    metachars, which must arrive escaped) and the starts_with/ends_with
    renames — the session-2 grammar additions."""
    code, ch = draw(
        st.sampled_from([(10, "\n"), (46, "."), (124, "|"), (43, "+")])
    )
    parts = draw(
        st.lists(st.sampled_from(["aa", "b", "ccc", "dd"]),
                 min_size=1, max_size=4)
    )
    s = ch.join(parts)
    lit = "'" + s.replace("'", "''") + "'"
    which = draw(st.integers(min_value=0, max_value=2))
    if which == 0:
        return f"len(string_split({lit}, chr({code})))", len(parts)
    if which == 1:
        probe = parts[0][:1]
        return (
            f"CASE WHEN starts_with({lit}, '{probe}') THEN 1 ELSE 0 END",
            1 if s.startswith(probe) else 0,
        )
    return (
        f"CASE WHEN ends_with({lit}, 'd') THEN 1 ELSE 0 END",
        1 if s.endswith("d") else 0,
    )


@st.composite
def _statement(draw, backslash_free=False):
    """backslash_free scopes the grammar for the stability property: the
    chr(N) split generator emits escaped regex-metachar literals, which
    the final escaping pass re-doubles on a second transpile by design
    (see module docstring)."""
    gens = [
        _empty_range_len(), _stepped_range_sum(),
        _param_interval_epoch(), _frac_epoch(),
        _list_reduce_fold(),
    ]
    if not backslash_free:
        gens.append(_chr_split_and_affix())
    exprs, expect = [], []
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        e, v = draw(st.one_of(*gens))
        exprs.append(e)
        expect.append(v)
    cols = ", ".join(
        f"CAST({e} AS BIGINT) AS c{i}" for i, e in enumerate(exprs)
    )
    return f"SELECT {cols}", expect


@given(_statement())
@settings(**_SETTINGS)
def test_round12_constructs_agree_across_engines(spark, case):
    stmt, expect = case
    duck = list(duckdb.connect().execute(stmt).fetchone())
    got = list(spark.sql(transpile_duckdb(stmt)).collect()[0])
    assert got == duck == expect, f"stmt={stmt!r}"


@given(_statement(backslash_free=True))
@settings(**_SETTINGS)
def test_transpile_is_semantically_stable(spark, case):
    """Re-transpiling the emitted Spark text must not change what it
    computes (no double-fixups of the exclusive ends, D-suffixes, pinned
    regex groups, …). Backslash-free by construction of this grammar —
    see module docstring for why backslashed literals are exempt."""
    stmt, _ = case
    t1 = transpile_duckdb(stmt)
    assert "\\" not in t1, "grammar should not emit backslashes"
    t2 = transpile_duckdb(t1)
    r1 = list(spark.sql(t1).collect()[0])
    r2 = list(spark.sql(t2).collect()[0])
    assert r1 == r2, f"stmt={stmt!r}\n t1={t1!r}\n t2={t2!r}"


def test_transpile_textually_idempotent_on_emitted_ranges():
    """The clamp+filter emission itself must be a fixed point (lambda
    bodies re-scanned on a second full transpile must not re-fix the
    already-fixed exclusive end)."""
    t1 = transpile_duckdb("SELECT range(0, 10, 3) AS r, range(2, 5) AS s")
    assert transpile_duckdb(t1) == t1
