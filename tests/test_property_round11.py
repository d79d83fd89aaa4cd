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


# ---- round-13 extensions: the round-12 session-2 rewrite classes ----

#: chr() codes the fold must handle: tab, newline, comma, pipe, hash —
#: the last three are regex-meta or plain, newline exercises a literal
#: that can't be spelled raw in a one-line statement
_CHR_CODES = [9, 10, 44, 124, 35]


@st.composite
def _chr_split_expr(draw):
    """len(string_split(data, chr(N))) — the chr(N) separator FOLD
    (r12 session-2) with the data string carrying the real character,
    so a wrong fold changes the count."""
    code = draw(st.sampled_from(_CHR_CODES))
    words = draw(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=4))
    data = chr(code).join(words)
    d_lit = "'" + data.replace("'", "''") + "'"
    return f"len(string_split({d_lit}, chr({code})))", len(words)


@st.composite
def _starts_ends_expr(draw):
    """starts_with/ends_with (r12 session-2 mappings) over needles that
    include regex metachars — both are LITERAL matches in both engines."""
    word = draw(st.sampled_from(["aa.bb", "a|b", "x(y", "plain", "a$"]))
    k = draw(st.integers(min_value=1, max_value=3))
    needle = word[:k] if draw(st.booleans()) else word[-k:]
    fn = draw(st.sampled_from(["starts_with", "ends_with"]))
    w_lit = "'" + word.replace("'", "''") + "'"
    n_lit = "'" + needle.replace("'", "''") + "'"
    val = word.startswith(needle) if fn == "starts_with" else word.endswith(needle)
    return f"CAST({fn}({w_lit}, {n_lit}) AS BIGINT)", int(val)


@st.composite
def _list_reduce_expr(draw):
    """list_reduce → aggregate mapping (r12) over a non-empty int list."""
    xs = draw(st.lists(ints, min_size=1, max_size=5))
    lit = "[" + ", ".join(str(x) for x in xs) + "]"
    op = draw(st.sampled_from(["+", "*"]))
    import functools
    import operator

    val = functools.reduce(operator.add if op == "+" else operator.mul, xs)
    return f"list_reduce({lit}, (a, b) -> a {op} b)", val


@st.composite
def _regexp_extract2_expr(draw):
    """2-arg regexp_extract (group-0 pin, r12 ADVICE fix): length of the
    FIRST match of a char-class run, computed independently in Python."""
    import re

    word = draw(st.sampled_from(["abc123de", "zz9", "42", "a1b22c333", "xyz"]))
    pat = draw(st.sampled_from(["[0-9]+", "[a-z]+", "b+"]))
    m = re.search(pat, word)
    return (
        f"length(regexp_extract('{word}', '{pat}'))",
        len(m.group(0)) if m else 0,
    )


@st.composite
def _statement(draw):
    exprs, expect = [], []
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        e, v = draw(
            st.one_of(
                _split_expr(), _int_arith(), _list_index(),
                _comprehension_sum(), _struct_field(), _power(),
                _chr_split_expr(), _starts_ends_expr(),
                _list_reduce_expr(), _regexp_extract2_expr(),
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
