"""Property differential for the round-11 dialect front end: statements
GENERATED from a grammar of the transpiler's rewrite classes (string_split
with arbitrary separators, //, **, list literals + 1-based indexing,
comprehensions, struct literals, comments with apostrophes, literals full
of metacharacters) execute on DuckDB verbatim and on Spark through
``transpile_duckdb`` — results must agree exactly. This guards the rewrite
passes where hand-written cases can't: nesting combinations and hostile
literal content. Derandomized like the other property files.
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

# separator alphabet leans hostile: regex metachars, quote, backslash
_SEPS = [".", "|", "?", "*", "+", "(", ")", "[", "{", "^", "$", "\\", "'", "-", " "]
_WORDS = ["aa", "b", "ccc", "dd"]

ints = st.integers(min_value=-9, max_value=9)
small = st.integers(min_value=1, max_value=6)


@st.composite
def _split_expr(draw):
    """len(string_split(s, sep)) over a data string BUILT from the same
    separator — counts parts, so a mis-escaped separator changes the
    value, not just the shape."""
    sep = draw(st.sampled_from(_SEPS))
    words = draw(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=4))
    data = sep.join(words)
    d_lit = "'" + data.replace("'", "''") + "'"
    s_lit = "'" + sep.replace("'", "''") + "'"
    return f"len(string_split({d_lit}, {s_lit}))", len(data.split(sep))


@st.composite
def _int_arith(draw):
    a, b = draw(ints), draw(small)
    op = draw(st.sampled_from(["//", "%", "+", "*"]))
    # keep // and % operands non-negative: DuckDB // floors while Spark
    # DIV truncates (a documented §2.12 rule every catalog oracle already
    # normalizes explicitly), and both engines' % is the C-style
    # remainder while Python's is floored
    if op in ("//", "%"):
        a = abs(a)
    expr = f"({a} {op} {b})"
    val = {"//": a // b, "%": a % b, "+": a + b, "*": a * b}[op]
    return expr, val


@st.composite
def _list_index(draw):
    xs = draw(st.lists(ints, min_size=1, max_size=5))
    i = draw(st.integers(min_value=1, max_value=len(xs)))
    lit = "[" + ", ".join(str(x) for x in xs) + "]"
    return f"{lit}[{i}]", xs[i - 1]


@st.composite
def _comprehension_sum(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    k = draw(small)
    return (
        f"list_sum([v * {k} FOR v IN range(0, {n})])",
        sum(v * k for v in range(n)),
    )


@st.composite
def _struct_field(draw):
    a, b = draw(ints), draw(ints)
    which = draw(st.booleans())
    return (
        f"({{'p': {a}, 'q': {b}}}).{'p' if which else 'q'}",
        a if which else b,
    )


@st.composite
def _power(draw):
    base = draw(st.integers(min_value=0, max_value=5))
    exp = draw(st.integers(min_value=0, max_value=3))
    return f"CAST({base} ** {exp} AS BIGINT)", base**exp


@st.composite
def _statement(draw):
    exprs, expect = [], []
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        e, v = draw(
            st.one_of(
                _split_expr(), _int_arith(), _list_index(),
                _comprehension_sum(), _struct_field(), _power(),
            )
        )
        exprs.append(e)
        expect.append(v)
    cols = ", ".join(
        f"CAST({e} AS BIGINT) AS c{i}" for i, e in enumerate(exprs)
    )
    stmt = f"SELECT {cols}"
    if draw(st.booleans()):  # comment with an apostrophe mid-statement
        stmt = stmt.replace(" AS c0", " AS c0 -- it's a note\n", 1)
    return stmt, expect


@given(_statement())
@settings(**_SETTINGS)
def test_generated_statements_agree_across_engines(spark, case):
    stmt, expect = case
    duck = list(duckdb.connect().execute(stmt).fetchone())
    got = list(spark.sql(transpile_duckdb(stmt)).collect()[0])
    assert got == duck == expect, f"stmt={stmt!r}"
