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
#: ``string_split`` is deliberately ABSENT from the rename table: DuckDB's
#: separator is a literal string while Spark's is a Java regex, so it gets
#: argument-aware handling in :func:`_rewrite_string_split` (a pure rename
#: would silently change semantics for separators like '.' or '|').
DUCKDB_TO_SPARK_FN: dict[str, str] = {
    v: k for k, v in SPARK_TO_DUCKDB_FN.items() if v != "string_split"
} | {
    "regexp_split_to_array": "split",  # Spark split IS regex-based
}

_JAVA_REGEX_META = set("\\.[]{}()*+-?^$|")


def _java_regex_quote(literal: str) -> str:
    """Escape a literal string so Java's regex engine matches it verbatim."""
    return "".join("\\" + c if c in _JAVA_REGEX_META else c for c in literal)


def _spark_string_literal(value: str) -> str:
    """Render a Python string as a Spark SQL single-quoted literal. Spark's
    default parser treats backslash as an escape, so backslashes double;
    quotes use the SQL-standard ``''`` doubling (Spark accepts both ``\\'``
    and ``''``) so the emitted literal still tokenizes correctly under this
    module's own ''-doubling scanner in the second pass."""
    return "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"


_STRING_SPLIT_CALL = re.compile(r"\bstring_split\s*\(", re.IGNORECASE)


def _rewrite_string_split(statement: str) -> str:
    """Rewrite ``string_split(expr, 'sep')`` → ``split(expr, '<regex-quoted
    sep>')``. DuckDB splits on the separator as a LITERAL; Spark's split
    takes a Java regex, so the separator literal is regex-escaped. A
    separator that is not a plain string literal (a column, a concat, …)
    cannot be escaped at transpile time and is rejected loudly rather than
    silently misbehaving. Inner string_split calls nested in the first
    argument are handled by rewriting right-to-left."""
    spans = [t.span() for t in _PROTECTED.finditer(statement)]

    def in_protected(i: int) -> tuple[bool, int]:
        for s, e in spans:
            if s <= i < e:
                return True, e
        return False, i

    edits: list[tuple[int, int, str]] = []  # (start, end, replacement)
    for m in _STRING_SPLIT_CALL.finditer(statement):
        hit, _ = in_protected(m.start())
        if hit:
            continue
        # Parse balanced arguments from after the '(' (skipping protected
        # regions so a ')' inside a literal doesn't close the call).
        depth, i, arg_starts = 1, m.end(), [m.end()]
        while i < len(statement) and depth:
            hit, end = in_protected(i)
            if hit:
                i = end
                continue
            c = statement[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                arg_starts.append(i + 1)
            i += 1
        if depth or len(arg_starts) != 2:
            raise ValueError(
                "transpile_duckdb: cannot rewrite string_split call "
                "(unbalanced or not exactly 2 args) at: "
                f"{statement[m.start():m.start() + 60]!r}"
            )
        first = statement[arg_starts[0] : arg_starts[1] - 1]
        second = statement[arg_starts[1] : i - 1].strip()
        lit = re.fullmatch(r"'((?:[^']|'')*)'", second)
        if not lit:
            raise ValueError(
                "transpile_duckdb: string_split separator must be a plain "
                f"string literal (got {second!r}) — DuckDB splits on a "
                "literal but Spark split takes a regex, so a non-literal "
                "separator cannot be made safe at transpile time"
            )
        sep = lit.group(1).replace("''", "'")  # undo SQL '' doubling
        edits.append((
            m.start(),
            i,
            f"split({first},"
            f"{_spark_string_literal(_java_regex_quote(sep))})",
        ))
    # Apply right-to-left so earlier offsets stay valid; drop edits nested
    # inside another edit's span (the outer rewrite already copied the
    # inner text verbatim — recurse to rewrite it).
    out = statement
    applied_outer = False
    for start, end, text in sorted(edits, reverse=True):
        if any(s < start and end <= e for s, e, _ in edits if (s, e) != (start, end)):
            continue
        out = out[:start] + text + out[end:]
        applied_outer = True
    if applied_outer and _STRING_SPLIT_CALL.search(out):
        out = _rewrite_string_split(out)
    return out

#: Dialect-isms that are not simple 1:1 function renames (kept tiny and
#: explicit; anything not listed rides through to Catalyst unchanged).
#: ``//`` is DuckDB integer division; Spark spells it the ANSI way.
_INT_DIV = re.compile(r"//")
_BARE_VARCHAR = re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE)

# one scan, four token classes: single-quoted strings (with '' escapes),
# double-quoted identifiers, SQL comments, and candidate function-call
# names. Protected classes are matched FIRST so a function name inside a
# literal ('size matters') or a comment is never rewritten — and, just as
# important, an apostrophe inside a comment (``-- it's a note``) cannot
# desynchronize string-literal tracking for the code that follows.
_PROTECTED_SRC = r"""
    '(?:[^']|'')*'                     # 'string literal'
  | "(?:[^"]|"")*"                     # "quoted identifier"
  | --[^\n]*                           # -- line comment
  | /\*(?:[^*]|\*(?!/))*\*/            # /* block comment */
"""
_PROTECTED = re.compile(_PROTECTED_SRC, re.VERBOSE)
_TOKEN = re.compile(
    rf"""
    (?P<protected>{_PROTECTED_SRC})
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

    statement = _rewrite_string_split(statement)

    def _sub(m: re.Match) -> str:
        if m.group("protected") is not None:
            return m.group(0)
        name = m.group("fn")
        return DUCKDB_TO_SPARK_FN.get(name.lower(), name)

    out = _TOKEN.sub(_sub, statement)
    # Non-call-position rewrites, applied outside string literals, quoted
    # identifiers AND comments (split keeps all protected token classes as
    # odd segments):
    # - '//' is DuckDB integer division → ANSI DIV;
    # - bare VARCHAR (no length) is a valid DuckDB cast target but Spark
    #   demands a length — STRING is the shared-semantics spelling.
    #   VARCHAR(n) is valid in both and passes through untouched.
    parts = re.split(rf"({_PROTECTED_SRC})", out, flags=re.VERBOSE)
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
