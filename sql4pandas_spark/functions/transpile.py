"""Reference-dialect SQL → Spark SQL transpilation (SURVEY.md §1.1: the
reference's identity is "SQL strings in, frames out"; checkout empty this
round, reconstruction per SURVEY.md §3.1 — its dialect is the
pandas/DuckDB-flavored ANSI surface our oracles are written in).

The divergence between that dialect and Spark SQL is, for the query shapes
the reference supports, almost entirely FUNCTION NAMES — the same
data-driven rename table the test harness uses (SPARK_TO_DUCKDB_FN,
functions/__init__.py), applied here in reverse. Everything structural
(SELECT/JOIN/GROUP BY/window/CTE syntax, CASE, CAST, operators) is shared
ANSI that Catalyst parses directly, so the transpiler deliberately does NOT
parse SQL: it rewrites function-call tokens outside string literals and
quoted identifiers, and leaves the rest to Spark's own parser. A construct
neither engine shares (e.g. DuckDB ``list_transform`` lambdas) fails loudly
in Catalyst's analyzer rather than silently misbehaving.

Scale note: transpilation is a driver-side string pass (microseconds,
O(|statement|)); the resulting plan is whatever Catalyst makes of the
rewritten text — no UDFs, no wrapper nodes, zero runtime cost.
"""

from __future__ import annotations

import re

from sql4pandas_spark.functions import SPARK_TO_DUCKDB_FN

#: DuckDB-name → Spark-name, derived (not hand-maintained) from the same
#: table the oracle harness reads, so the two directions can never drift.
#: Reverse-only synonyms: DuckDB spellings with no distinct Spark partner
#: (their Spark target is already claimed by another reverse pair).
DUCKDB_TO_SPARK_FN: dict[str, str] = {
    v: k for k, v in SPARK_TO_DUCKDB_FN.items()
} | {
    "regexp_split_to_array": "split",  # Spark split IS regex-based
}

#: Dialect-isms that are not simple 1:1 function renames (kept tiny and
#: explicit; anything not listed rides through to Catalyst unchanged).
#: ``//`` is DuckDB integer division; Spark spells it the ANSI way.
_INT_DIV = re.compile(r"//")
_BARE_VARCHAR = re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE)

# one scan, three token classes: single-quoted strings (with '' escapes),
# double-quoted identifiers, and candidate function-call names. Strings and
# quoted identifiers are matched FIRST so a function name inside a literal
# ('size matters') is never rewritten.
_TOKEN = re.compile(
    r"""
    (?P<str>'(?:[^']|'')*')            # 'string literal'
  | (?P<ident>"(?:[^"]|"")*")          # "quoted identifier"
  | (?P<fn>\b[A-Za-z_][A-Za-z0-9_]*\b)(?=\s*\()   # name followed by (
    """,
    re.VERBOSE,
)


def transpile_duckdb(statement: str) -> str:
    """Rewrite a DuckDB-dialect (reference-dialect) SQL string to Spark SQL.

    Mechanics: function-call names found in :data:`DUCKDB_TO_SPARK_FN`
    (case-insensitive, word-boundary, call-position only — ``len(x)``
    rewrites, a column named ``len`` does not) are renamed; string
    literals and quoted identifiers pass through byte-identical; ``//``
    becomes the ANSI ``DIV``. Everything else is left for Catalyst.
    """

    def _sub(m: re.Match) -> str:
        if m.group("str") is not None or m.group("ident") is not None:
            return m.group(0)
        name = m.group("fn")
        return DUCKDB_TO_SPARK_FN.get(name.lower(), name)

    out = _TOKEN.sub(_sub, statement)
    # Non-call-position rewrites, applied outside string literals AND
    # quoted identifiers (split keeps both as odd segments):
    # - '//' is DuckDB integer division → ANSI DIV;
    # - bare VARCHAR (no length) is a valid DuckDB cast target but Spark
    #   demands a length — STRING is the shared-semantics spelling.
    #   VARCHAR(n) is valid in both and passes through untouched.
    # SQL comments are NOT masked: a rename inside a comment cannot
    # change semantics, only comment text.
    parts = re.split(r"""('(?:[^']|'')*'|"(?:[^"]|"")*")""", out)
    parts = [
        p
        if i % 2
        else _BARE_VARCHAR.sub("STRING", _INT_DIV.sub(" DIV ", p))
        for i, p in enumerate(parts)
    ]
    return "".join(parts)


_DIALECTS = {
    None: lambda s: s,
    "spark": lambda s: s,
    "duckdb": transpile_duckdb,
}


def to_spark_sql(statement: str, dialect: str | None = None) -> str:
    """Dispatch a statement through the named dialect's rewriter."""
    try:
        fn = _DIALECTS[dialect]
    except KeyError:
        raise ValueError(
            f"unknown dialect {dialect!r}; supported: "
            f"{sorted(k for k in _DIALECTS if k)}"
        ) from None
    return fn(statement)
