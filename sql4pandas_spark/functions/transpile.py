"""Reference-dialect SQL → Spark SQL transpilation (SURVEY.md §1.1: the
reference's identity is "SQL strings in, frames out"; checkout empty this
round, reconstruction per SURVEY.md §3.1 — its dialect is the
pandas/DuckDB-flavored ANSI surface our oracles are written in).

The divergence between that dialect and Spark SQL is, for the query shapes
the reference supports, almost entirely surface spelling — function names
(the same data-driven rename table the test harness uses, applied in
reverse), a handful of argument-shape differences handled by explicit
call rewriters, and the two literal-escaping rules (DuckDB string literals
are raw where Spark treats backslash as an escape; DuckDB double-quotes
identifiers where Spark uses backticks). Everything structural
(SELECT/JOIN/GROUP BY/window/CTE syntax, CASE, CAST, operators) is shared
ANSI that Catalyst parses directly, so the transpiler deliberately does NOT
parse SQL: it rewrites tokens outside string literals, quoted identifiers
and comments, and leaves the rest to Spark's own parser. A construct
neither engine shares (e.g. DuckDB list comprehensions) fails loudly in
Catalyst's analyzer rather than silently misbehaving; call shapes that
cannot be made safe (a non-literal string_split separator, a non-'g'
regexp flag) raise here.

Statement-level parity is proven at catalog width by
tools/transpile_sweep.py: every sql-oracled entry's own DuckDB oracle text
runs through this module on Spark and value-hash-matches DuckDB's result
(tests/test_transpile_parity.py pins the count and the skip list).

Scale note: transpilation is a driver-side string pass (microseconds,
O(|statement|)); the resulting plan is whatever Catalyst makes of the
rewritten text — no UDFs, no wrapper nodes, zero runtime cost.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from sql4pandas_spark.functions import SPARK_TO_DUCKDB_FN

#: DuckDB-name → Spark-name, derived (not hand-maintained) from the same
#: table the oracle harness reads, so the two directions can never drift.
#: Reverse-only synonyms: DuckDB spellings with no distinct Spark partner
#: (their Spark target is already claimed by another reverse pair) plus
#: pure renames that only ever appear reference-side.
#: ``string_split`` is deliberately ABSENT from the rename table: DuckDB's
#: separator is a literal string while Spark's is a Java regex, so it gets
#: argument-aware handling in :data:`_ARG_REWRITERS` (a pure rename would
#: silently change semantics for separators like '.' or '|').
DUCKDB_TO_SPARK_FN: dict[str, str] = {
    v: k for k, v in SPARK_TO_DUCKDB_FN.items() if v != "string_split"
} | {
    "regexp_split_to_array": "split",  # Spark split IS regex-based
    "epoch_us": "unix_micros",         # µs since epoch, BIGINT in both
    "strpos": "instr",                 # 1-based find, same arg order
    # generate_series is NOT a pure rename: both ends are inclusive in both
    # dialects, but an empty series ([] in DuckDB) becomes a DESCENDING
    # sequence in Spark — argument-aware handling in _ARG_REWRITERS
    "quantile_cont": "percentile",     # exact interpolated quantile
    "json_keys": "json_object_keys",
    "list": "collect_list",            # aggregate; DISTINCT rides through
    "list_min": "array_min",
    "list_max": "array_max",
    "unicode": "ascii",                # both: codepoint of first char
    "starts_with": "startswith",       # same 2-arg prefix test
    "ends_with": "endswith",           # same 2-arg suffix test
    # set semantics (distinct elements in both) shared; element ORDER is
    # engine-specific, so oracles emitting the array itself (not a
    # len()/membership over it) must wrap it in list_sort
    "list_intersect": "array_intersect",
    # epoch is NOT a pure rename: DuckDB returns DOUBLE seconds (sub-second
    # precision preserved) while unix_timestamp truncates to BIGINT —
    # argument-aware handling in _ARG_REWRITERS emits unix_micros/1e6
}

_JAVA_REGEX_META = set("\\.[]{}()*+-?^$|")


def _java_regex_quote(literal: str) -> str:
    """Escape a literal string so Java's regex engine matches it verbatim."""
    return "".join("\\" + c if c in _JAVA_REGEX_META else c for c in literal)


def _sql_string_literal(value: str) -> str:
    """Render a Python string as a DuckDB-spelling SQL literal ('' doubling,
    raw backslashes) — the final literal-escaping pass converts every
    literal, including emitted ones, to Spark spelling in one place."""
    return "'" + value.replace("'", "''") + "'"


# --------------------------------------------------------------- tokenizer

# Protected token classes, matched FIRST so a function name inside a
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

# ------------------------------------------------- argument-aware rewrites


def _rw_string_split(args: list[str]) -> str:
    """DuckDB splits on a LITERAL separator; Spark split takes a Java
    regex — the separator literal is regex-escaped. A separator that is
    not a plain string literal (a column, a concat, …) cannot be escaped
    at transpile time and is rejected loudly."""
    if len(args) != 2:
        raise ValueError(
            f"transpile_duckdb: string_split expects 2 args, got {len(args)}"
        )
    arg = args[1].strip()
    lit = re.fullmatch(r"'((?:[^']|'')*)'", arg)
    chr_call = re.fullmatch(r"(?i)chr\s*\(\s*(\d+)\s*\)", arg)
    if lit:
        sep = lit.group(1).replace("''", "'")  # undo SQL '' doubling
    elif chr_call:
        # chr(N) with an integer literal is a compile-time constant —
        # fold it to the character and escape like any literal (the
        # oracles' portable newline spelling, since a raw newline can't
        # sit inside a one-line SQL string)
        code_point = int(chr_call.group(1))
        if not 0 <= code_point <= 0x10FFFF or 0xD800 <= code_point <= 0xDFFF:
            # Surrogates pass chr() but a lone surrogate cannot be
            # UTF-8-encoded — reject here with the descriptive error
            # instead of letting it resurface as an encode failure.
            raise ValueError(
                "transpile_duckdb: string_split separator "
                f"chr({code_point}) is outside the encodable Unicode "
                "code-point range ([0, 0x10FFFF] minus the surrogate "
                "block 0xD800-0xDFFF) and cannot be folded to a character"
            )
        sep = chr(code_point)
    else:
        raise ValueError(
            "transpile_duckdb: string_split separator must be a plain "
            f"string literal or chr(<int>) (got {arg!r}) — DuckDB splits "
            "on a literal but Spark split takes a regex, so a non-constant "
            "separator cannot be made safe at transpile time"
        )
    return f"split({args[0]},{_sql_string_literal(_java_regex_quote(sep))})"


def _rw_list_sum(args: list[str]) -> str:
    """list_sum(xs) → aggregate with an init that inherits the element
    type: ``0L * try_element_at(xs, 1)`` is BIGINT 0 for integer lists and
    DOUBLE 0.0 for double lists, so integer sums keep 64-bit exactness
    (a DOUBLE accumulator would corrupt >2^53 hash sums). NULL elements
    poison the sum here but not in DuckDB — acceptable because the sweep
    value-checks every oracle, and our oracles sum non-null lists."""
    if len(args) != 1:
        raise ValueError("transpile_duckdb: list_sum expects 1 arg")
    x = args[0]
    return f"aggregate({x}, 0L * try_element_at({x}, 1), (a, v) -> a + v)"


def _rw_list_slice(args: list[str]) -> str:
    """list_slice(x, a, b) is end-INCLUSIVE; Spark slice takes a length."""
    if len(args) != 3:
        raise ValueError("transpile_duckdb: list_slice expects 3 args")
    x, a, b = args
    return f"slice({x}, {a}, ({b}) - ({a}) + 1)"


def _bounded_sequence(a: str, b: str, step: str | None, var: str,
                      inclusive: bool) -> str:
    """Emit a Spark sequence over [a, b) / [a, b] that yields the EMPTY
    array when the range is empty, exactly like DuckDB's range /
    generate_series. A bare ``sequence(a, (b)-1)`` is a trap: when b <= a
    Spark infers step -1 and produces a DESCENDING array (e.g.
    range(0, 0) → sequence(0, -1) → [0, -1]) instead of []. Clamping the
    stop to ``greatest(a, …)`` keeps sequence's direction non-negative and
    the trailing lambda filter drops the clamp artifact, so the empty case
    returns [] with the correct element type (no ``array()`` type hole).
    ``var`` must be unique per caller: Spark rejects shadowed lambda
    variable names when one emitted sequence nests inside another
    higher-order function."""
    cmp = "<=" if inclusive else "<"
    stop = f"({b})" if inclusive else f"({b}) - 1"
    tail = f", {step}" if step else ""
    return (
        f"filter(sequence({a}, greatest(({a}), {stop}){tail}), "
        f"{var} -> {var} {cmp} ({b}))"
    )


def _rw_range(args: list[str]) -> str:
    """Scalar-position range(…) is end-EXCLUSIVE in DuckDB; Spark sequence
    is inclusive — and an EMPTY DuckDB range must stay empty on Spark (see
    :func:`_bounded_sequence`). (FROM-position range is left alone —
    Spark's range TVF is also end-exclusive.)"""
    if len(args) == 1:
        return _bounded_sequence("0", args[0], None, "rg_i", inclusive=False)
    if len(args) == 2:
        return _bounded_sequence(args[0], args[1], None, "rg_i",
                                 inclusive=False)
    if len(args) == 3:
        step = args[2].strip()
        m = re.fullmatch(r"(-?)\s*\d+", step)
        if m:
            if not m.group(1):  # positive literal step
                return _bounded_sequence(args[0], args[1], step, "rg_i",
                                         inclusive=False)
            # negative step: stops > b in DuckDB, >= b+1 in sequence;
            # least-clamp + filter mirrors the empty-range guard
            a, b = args[0], args[1]
            return (
                f"filter(sequence({a}, least(({a}), ({b}) + 1), {step}), "
                f"rg_i -> rg_i > ({b}))"
            )
        raise ValueError(
            "transpile_duckdb: stepped range(a, b, s) needs a literal "
            "integer step to fix up the exclusive end (got "
            f"{step!r}) — use generate_series for inclusive semantics"
        )
    raise ValueError("transpile_duckdb: range expects 1-3 args")


_POSITIVE_INTERVAL = re.compile(r"INTERVAL\s+'?\d+'?\s+\w+", re.IGNORECASE)


def _rw_generate_series(args: list[str]) -> str:
    """generate_series is end-INCLUSIVE in both dialects, but DuckDB
    returns [] when the stop precedes the start while Spark's sequence
    infers step -1 and descends — same empty-range trap as range() (see
    :func:`_bounded_sequence`). Positive literal steps (integers and the
    oracle spines' ``INTERVAL 1 DAY`` forms) get the clamp+filter guard;
    a non-literal step has unknowable direction and fails loudly."""
    if len(args) == 1:
        return _bounded_sequence("0", args[0], None, "gs_i", inclusive=True)
    if len(args) == 2:
        return _bounded_sequence(args[0], args[1], None, "gs_i",
                                 inclusive=True)
    if len(args) == 3:
        step = args[2].strip()
        m = re.fullmatch(r"(-?)\s*\d+", step)
        if m and m.group(1):  # negative literal step: stops >= b
            a, b = args[0], args[1]
            return (
                f"filter(sequence({a}, least(({a}), ({b})), {step}), "
                f"gs_i -> gs_i >= ({b}))"
            )
        if m or _POSITIVE_INTERVAL.fullmatch(step):
            return _bounded_sequence(args[0], args[1], step, "gs_i",
                                     inclusive=True)
        raise ValueError(
            "transpile_duckdb: generate_series(a, b, s) needs a literal "
            "integer or positive INTERVAL step so the empty-range "
            f"direction is known at transpile time (got {step!r})"
        )
    raise ValueError("transpile_duckdb: generate_series expects 1-3 args")


def _rw_encode(args: list[str]) -> str:
    """DuckDB encode(s) → UTF-8 blob; Spark's encode demands the charset."""
    if len(args) == 1:
        return f"encode({args[0]}, 'UTF-8')"
    return f"encode({', '.join(a.strip() for a in args)})"


def _rw_regexp_replace(args: list[str]) -> str:
    """DuckDB's 4th arg is a flags string; Spark replaces globally by
    default, so 'g' simply drops. The 3-arg (flagless) form is a TRAP —
    DuckDB replaces only the FIRST occurrence while Spark replaces ALL —
    but it must stay an identity PASS-THROUGH here because the 4-arg
    rewrite EMITS a Spark-form 3-arg call that later fixpoint passes
    re-scan; the loud rejection of source-level 3-arg calls lives in
    :func:`_validate_regexp_replace`, which only ever sees the ORIGINAL
    statement. Any other flag has no Spark spelling."""
    if len(args) == 3:
        return f"regexp_replace({', '.join(a.strip() for a in args)})"
    if len(args) == 4 and args[3].strip() in ("'g'", "'G'"):
        return f"regexp_replace({', '.join(a.strip() for a in args[:3])})"
    raise ValueError(
        "transpile_duckdb: regexp_replace flags other than 'g' "
        f"(got {args[3:] if len(args) > 3 else args}) have no Spark equivalent"
    )


def _validate_regexp_replace(args: list[str]) -> None:
    """Reject the 3-arg form in SOURCE statements: DuckDB without the 'g'
    flag replaces only the FIRST occurrence (regexp_replace('aaa','a','X')
    = 'Xaa') while Spark replaces ALL ('XXX') — silent value divergence,
    so it fails loudly per the module contract."""
    if len(args) == 3:
        raise ValueError(
            "transpile_duckdb: 3-arg regexp_replace is first-occurrence-"
            "only in DuckDB but replace-ALL in Spark; add the 'g' flag if "
            "you mean global replacement (no Spark spelling exists for "
            "first-only)"
        )


_INDEX_LAMBDA_RE = re.compile(r"^\(\s*\w+\s*,\s*\w+\s*\)\s*->")


def _validate_no_index_lambda(args: list[str]) -> None:
    """Reject (element, index) lambdas in list_transform/list_filter:
    DuckDB's index is 1-BASED while Spark transform/filter's is 0-BASED,
    and the lambda body passes through the transpiler UNCHANGED — a
    silent off-by-one on every element. No rewrite is attempted (the
    index variable's use sites inside an arbitrary body can't be safely
    rebased textually); restructure with list_slice / explicit ranges,
    which transpile exactly."""
    for a in args:
        if _INDEX_LAMBDA_RE.match(a.strip()):
            raise ValueError(
                "transpile_duckdb: (x, i) index lambdas are 1-based in "
                "DuckDB but 0-based in Spark — a silent off-by-one; "
                "restructure with list_slice/range instead "
                f"(got {a.strip()[:60]!r})"
            )


#: name → validator(args) run over the ORIGINAL statement's call sites only
#: (first fixpoint pass) — rejects argument shapes whose DuckDB semantics
#: have no Spark spelling, without tripping on Spark-form text that the
#: rewriters themselves emit.
_SOURCE_SHAPE_VALIDATORS: dict[str, Callable[[list[str]], None]] = {
    "regexp_replace": _validate_regexp_replace,
    "list_transform": _validate_no_index_lambda,
    "list_filter": _validate_no_index_lambda,
}


def _rw_regexp_extract(args: list[str]) -> str:
    """DuckDB's default group is 0 (whole match); Spark's default is 1 —
    pin group 0 explicitly when the statement omitted it (the same
    divergence :func:`_rw_regexp_extract_all` already guards)."""
    if len(args) == 2:
        return f"regexp_extract({args[0]}, {args[1]}, 0)"
    return f"regexp_extract({', '.join(a.strip() for a in args)})"


def _rw_epoch(args: list[str]) -> str:
    """DuckDB epoch(ts) is DOUBLE seconds with sub-second precision; Spark
    unix_timestamp() is BIGINT and silently truncates fractional seconds.
    unix_micros gives exact µs, so µs/1e6 reproduces DuckDB's double
    exactly (µs counts < 2^53 are double-lossless — ~285 years)."""
    if len(args) != 1:
        raise ValueError("transpile_duckdb: epoch expects 1 arg")
    return f"(unix_micros({args[0]}) / 1000000.0)"


def _rw_regexp_extract_all(args: list[str]) -> str:
    """DuckDB's default group is 0 (whole match); Spark's default is 1 —
    pin group 0 explicitly when the statement omitted it."""
    if len(args) == 2:
        return f"regexp_extract_all({args[0]}, {args[1]}, 0)"
    return f"regexp_extract_all({', '.join(a.strip() for a in args)})"


def _rw_struct_pack(args: list[str]) -> str:
    """struct_pack(a := x, b := y) → named_struct('a', x, 'b', y)."""
    fields = []
    for a in args:
        m = re.match(r"\s*([A-Za-z_]\w*)\s*:=", a)
        if not m:
            raise ValueError(
                f"transpile_duckdb: struct_pack field without ':=' ({a!r})"
            )
        fields.append(f"'{m.group(1)}', {a[m.end():].strip()}")
    return f"named_struct({', '.join(fields)})"


def _rw_list_reduce(args: list[str]) -> str:
    """DuckDB list_reduce(xs, (acc, x) -> …) seeds the accumulator with
    the FIRST element and folds the rest left-to-right; Spark's aggregate
    wants an explicit init, so emit aggregate(rest, first, λ). Callers
    wanting an explicit seed prepend it (``[0] || xs``) — the shared-
    syntax idiom both engines parse. Empty-list divergence: DuckDB raises,
    the Spark emission yields NULL (NULL init over an empty slice) — the
    value-checked sweeps keep any such use honest."""
    if len(args) != 2:
        raise ValueError(
            "transpile_duckdb: list_reduce expects 2 args (list, lambda)"
        )
    xs, lam = args[0].strip(), args[1].strip()
    return (
        f"aggregate(slice({xs}, 2, greatest(size({xs}) - 1, 0)), "
        f"try_element_at({xs}, 1), {lam})"
    )


def _rw_list_avg(args: list[str]) -> str:
    """list_avg(xs) → sum/size with try_divide so the empty list yields
    NULL (DuckDB's behavior) instead of an ANSI divide-by-zero."""
    if len(args) != 1:
        raise ValueError("transpile_duckdb: list_avg expects 1 arg")
    x = args[0]
    return (
        f"try_divide(aggregate({x}, 0D, (a, v) -> a + v), size({x}))"
    )


def _rw_list_cosine(args: list[str]) -> str:
    """list_cosine_similarity(a, b) → dot/(|a|·|b|) over zip_with/aggregate
    (double math, matching DuckDB's double result)."""
    if len(args) != 2:
        raise ValueError(
            "transpile_duckdb: list_cosine_similarity expects 2 args"
        )
    a, b = (x.strip() for x in args)
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, v) -> s + v)"
    na = f"sqrt(aggregate(transform({a}, x -> x * x), 0D, (s, v) -> s + v))"
    nb = f"sqrt(aggregate(transform({b}, x -> x * x), 0D, (s, v) -> s + v))"
    return f"({dot} / ({na} * {nb}))"


_IGNORE_NULLS_TAIL = re.compile(r"\s+IGNORE\s+NULLS\s*$", re.IGNORECASE)


def _make_rw_ignore_nulls(fn: str):
    """DuckDB puts IGNORE NULLS INSIDE the window function's parens
    (``last_value(x IGNORE NULLS)``); Spark wants it outside
    (``last_value(x) IGNORE NULLS``)."""

    def rw(args: list[str]) -> str:
        if args and _IGNORE_NULLS_TAIL.search(args[-1]):
            cleaned = args[:-1] + [_IGNORE_NULLS_TAIL.sub("", args[-1])]
            return (
                f"{fn}({', '.join(a.strip() for a in cleaned)}) IGNORE NULLS"
            )
        return f"{fn}({', '.join(a.strip() for a in args)})"

    return rw


def _rw_xor(args: list[str]) -> str:
    """DuckDB spells bitwise xor as a function; Spark as the ^ operator."""
    if len(args) != 2:
        raise ValueError("transpile_duckdb: xor expects 2 args")
    return f"(({args[0]}) ^ ({args[1]}))"


def _rw_date_diff(args: list[str]) -> str:
    """DuckDB quotes the unit ('day'); Spark's date_diff wants it bare.
    NOTE both engines count BOUNDARY CROSSINGS for date_diff? They do not:
    DuckDB counts boundaries, Spark's 3-arg date_diff counts complete
    units (timestampdiff semantics) — identical for DATE-typed arguments,
    divergent for intra-day timestamps. The parity sweep value-checks
    every use; a timestamp-granularity use must be skip-listed."""
    if len(args) == 3:
        unit = args[0].strip()
        m = re.fullmatch(r"'(\w+)'", unit)
        if m:
            return (
                f"date_diff({m.group(1).upper()}, "
                f"{args[1].strip()}, {args[2].strip()})"
            )
    return f"date_diff({', '.join(a.strip() for a in args)})"


def _rw_to_microseconds(args: list[str]) -> str:
    """µs count → day-time interval (make_dt_interval stores µs exactly
    for any magnitude a double represents losslessly, i.e. < 2^53 µs
    ≈ 285 years — beyond every fixture horizon)."""
    if len(args) != 1:
        raise ValueError("transpile_duckdb: to_microseconds expects 1 arg")
    return f"make_dt_interval(0, 0, 0, ({args[0]}) / 1000000.0)"


#: name → rewriter(args) for calls whose ARGUMENT SHAPE differs between the
#: dialects (a pure rename would change semantics). Applied before the
#: rename pass; case-insensitive; occurrences inside literals/comments are
#: untouched; nested registered calls are rewritten via fixpoint recursion.
_ARG_REWRITERS: dict[str, Callable[[list[str]], str]] = {
    "string_split": _rw_string_split,
    "list_sum": _rw_list_sum,
    "list_slice": _rw_list_slice,
    "range": _rw_range,
    "generate_series": _rw_generate_series,
    "encode": _rw_encode,
    "epoch": _rw_epoch,
    "regexp_replace": _rw_regexp_replace,
    "regexp_extract": _rw_regexp_extract,
    "regexp_extract_all": _rw_regexp_extract_all,
    "to_microseconds": _rw_to_microseconds,
    "xor": _rw_xor,
    "date_diff": _rw_date_diff,
    "datediff": _rw_date_diff,
    "struct_pack": _rw_struct_pack,
    "list_reduce": _rw_list_reduce,
    "list_avg": _rw_list_avg,
    "list_cosine_similarity": _rw_list_cosine,
    "first_value": _make_rw_ignore_nulls("first_value"),
    "last_value": _make_rw_ignore_nulls("last_value"),
    "nth_value": _make_rw_ignore_nulls("nth_value"),
    "lag": _make_rw_ignore_nulls("lag"),
    "lead": _make_rw_ignore_nulls("lead"),
}

#: validate-only names: visited for _SOURCE_SHAPE_VALIDATORS but with no
#: rewriter — their call text is left untouched (the later rename pass
#: handles list_transform→transform etc.)
_VALIDATE_ONLY = sorted(set(_SOURCE_SHAPE_VALIDATORS) - set(_ARG_REWRITERS))

_ARG_CALL = re.compile(
    r"\b(" + "|".join((*_ARG_REWRITERS, *_VALIDATE_ONLY)) + r")\s*\(",
    re.IGNORECASE,
)
#: range/generate_series in FROM position are table functions; Spark's own
#: range TVF matches DuckDB's end-exclusive semantics, so those stay.
_FROM_TAIL = re.compile(r"\b(?:FROM|JOIN)\s*$", re.IGNORECASE)


def _rewrite_calls(statement: str, validate: bool = False) -> str:
    """Apply :data:`_ARG_REWRITERS` to every unprotected call site, parsing
    balanced top-level argument lists (protected regions are opaque, so a
    ')' or ',' inside a literal never splits args). ``validate`` runs the
    :data:`_SOURCE_SHAPE_VALIDATORS` too — set only for the first fixpoint
    pass, where every call site is still source text."""
    spans = [t.span() for t in _PROTECTED.finditer(statement)]

    def in_protected(i: int) -> tuple[bool, int]:
        for s, e in spans:
            if s <= i < e:
                return True, e
        return False, i

    edits: list[tuple[int, int, str]] = []  # (start, end, replacement)
    for m in _ARG_CALL.finditer(statement):
        hit, _ = in_protected(m.start())
        if hit:
            continue
        name = m.group(1).lower()
        if name == "range" and _FROM_TAIL.search(statement[: m.start()]):
            continue  # table-function position: Spark range TVF matches
        depth, i = 1, m.end()
        arg_starts = [m.end()]
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
        if depth:
            raise ValueError(
                f"transpile_duckdb: unbalanced {name} call at: "
                f"{statement[m.start():m.start() + 60]!r}"
            )
        bounds = arg_starts + [i]  # arg k spans bounds[k]..bounds[k+1]-1
        args = [
            statement[bounds[k] : bounds[k + 1] - 1]
            for k in range(len(arg_starts))
        ]
        if args == [""]:
            args = []
        if validate and name in _SOURCE_SHAPE_VALIDATORS:
            _SOURCE_SHAPE_VALIDATORS[name](args)
        if name not in _ARG_REWRITERS:
            continue  # validate-only name: no rewrite, no edit
        text = _ARG_REWRITERS[name](args)
        # An identity rewrite (pass-through shape, e.g. last_value without
        # IGNORE NULLS or an already-3-arg regexp_extract) must NOT become
        # an edit: its span would shadow nested registered calls in the
        # drop-nested step below on EVERY fixpoint pass, so an epoch(…)
        # inside a pass-through last_value(…) would never be rewritten.
        if text != statement[m.start():i]:
            edits.append((m.start(), i, text))
    # Apply right-to-left so earlier offsets stay valid; drop edits nested
    # inside another edit's span (the outer rewrite copied the inner text
    # verbatim — the fixpoint loop in the caller rewrites it).
    out = statement
    for start, end, text in sorted(edits, reverse=True):
        if any(s < start and end <= e for s, e, _ in edits if (s, e) != (start, end)):
            continue
        out = out[:start] + text + out[end:]
    return out


def _rewrite_calls_fixpoint(statement: str) -> str:
    """Iterate :func:`_rewrite_calls` until the text stabilizes — needed
    because an outer rewrite copies nested registered calls verbatim.
    Pass-through rewriters (3-arg regexp_replace, 2-arg encode, …) leave
    matching names in the output, so termination is on TEXT fixpoint, not
    on match absence; the bound is belt-and-braces against a rewriter
    that never stabilizes."""
    for it in range(50):
        nxt = _rewrite_calls(statement, validate=(it == 0))
        if nxt == statement:
            return nxt
        statement = nxt
    raise ValueError("transpile_duckdb: call rewriting did not stabilize")


# ------------------------------------------------------- bracket rewrites
#
# DuckDB uses square brackets three ways Spark doesn't:
#   CAST(x AS DOUBLE[])   array TYPE suffix      → ARRAY<DOUBLE>
#   ['a', 'b']            list literal           → array('a', 'b')
#   xs[i]                 1-based element access → try_element_at(xs, i)
# try_element_at is exact for the access case: both are 1-based, both
# support negative from-the-end indexes, and both return NULL out of
# bounds (ansi-safe). DuckDB slice syntax xs[a:b] has no textual Spark
# equivalent and raises.

_IDENT_CHARS = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_")

#: words that can directly precede a LIST LITERAL — a bracket after one of
#: these is never an element access on the keyword itself
_KEYWORDS_BEFORE_LITERAL = {
    "SELECT", "WHERE", "WHEN", "THEN", "ELSE", "END", "AND", "OR", "NOT",
    "IN", "ON", "BY", "HAVING", "RETURN", "RETURNS", "UNION", "ALL",
    "DISTINCT", "AS", "CASE", "BETWEEN", "LIMIT", "OFFSET",
}


def _rewrite_brackets(statement: str) -> str:
    """Rewrite the first unprotected ``[`` and recurse until none remain."""
    for _ in range(200):
        nxt = _rewrite_brackets_once(statement)
        if nxt is None:
            return statement
        statement = nxt
    raise ValueError("transpile_duckdb: bracket rewriting did not stabilize")


def _rewrite_brackets_once(statement: str) -> str | None:
    spans = [t.span() for t in _PROTECTED.finditer(statement)]

    def span_at(i: int) -> tuple[int, int] | None:
        for s, e in spans:
            if s <= i < e:
                return (s, e)
        return None

    i = 0
    while i < len(statement):
        pr = span_at(i)
        if pr:
            i = pr[1]
            continue
        if statement[i] != "[":
            i += 1
            continue
        # classify by previous non-space character (protected span counts
        # as a token: string-literal or quoted-identifier base)
        j = i - 1
        while j >= 0 and statement[j].isspace():
            j -= 1
        prev_span = span_at(j) if j >= 0 else None
        is_access = j >= 0 and (
            prev_span is not None
            or statement[j] in ")]"
            or statement[j] in _IDENT_CHARS
            or statement[j] == ">"  # ARRAY<...> from an earlier pass
        )
        if is_access and prev_span is None and statement[j] in _IDENT_CHARS:
            w = j
            while w >= 0 and statement[w] in _IDENT_CHARS:
                w -= 1
            if statement[w + 1 : j + 1].upper() in _KEYWORDS_BEFORE_LITERAL:
                is_access = False
        # find the matching ']' (balanced, protected-opaque)
        depth, k, top_colon = 1, i + 1, False
        while k < len(statement) and depth:
            pr = span_at(k)
            if pr:
                k = pr[1]
                continue
            c = statement[k]
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            elif c == ":" and depth == 1:
                top_colon = True
            k += 1
        if depth:
            raise ValueError(
                "transpile_duckdb: unbalanced '[' at: "
                f"{statement[i:i + 40]!r}"
            )
        inner = statement[i + 1 : k - 1]
        if not is_access:
            comp = _parse_comprehension(inner)
            if comp is not None:
                expr, var, src, cond = comp
                if cond is not None:
                    repl = (
                        f"transform(filter({src}, {var} -> {cond}), "
                        f"{var} -> {expr})"
                    )
                else:
                    repl = f"transform({src}, {var} -> {expr})"
                return statement[:i] + repl + statement[k:]
            return statement[:i] + "array(" + inner + ")" + statement[k:]
        if top_colon:
            raise ValueError(
                "transpile_duckdb: list slice syntax xs[a:b] has no Spark "
                f"equivalent at: {statement[i - 10 if i >= 10 else 0:k]!r}"
            )
        if re.fullmatch(r"'(?:[^']|'')*'", inner.strip()):
            # string-literal key: Spark's own bracket accessor handles
            # BOTH structs (field access) and maps (NULL when missing,
            # matching DuckDB) — pass through verbatim. try_element_at
            # would reject structs.
            i = k
            continue
        base_start = _base_start(statement, j, spans)
        base = statement[base_start : j + 1]
        if inner.strip() == "":
            # TYPE[] array-type suffix (an empty index is never valid SQL)
            return (
                statement[:base_start]
                + "ARRAY<"
                + base
                + ">"
                + statement[k:]
            )
        return (
            statement[:base_start]
            + f"try_element_at({base}, {inner})"
            + statement[k:]
        )
    return None


def _spans_of(statement: str) -> list[tuple[int, int]]:
    return [t.span() for t in _PROTECTED.finditer(statement)]


def _split_top(s: str, sep: str) -> list[str]:
    """Split on depth-0 unprotected occurrences of the single char ``sep``."""
    parts, depth, i, start = [], 0, 0, 0
    while i < len(s):
        m = _PROTECTED.match(s, i)
        if m:
            i = m.end()
            continue
        c = s[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def _rewrite_struct_literals(statement: str) -> str:
    """DuckDB ``{'k': v, …}`` struct literals → named_struct('k', v, …);
    a ``MAP {'k': v}`` prefix → map('k', v, …)."""
    for _ in range(100):
        nxt = _rewrite_struct_once(statement)
        if nxt is None:
            return statement
        statement = nxt
    raise ValueError("transpile_duckdb: struct rewriting did not stabilize")


def _rewrite_struct_once(statement: str) -> str | None:
    spans = _spans_of(statement)

    def span_at(i: int) -> tuple[int, int] | None:
        for s, e in spans:
            if s <= i < e:
                return (s, e)
        return None

    i = 0
    while i < len(statement):
        pr = span_at(i)
        if pr:
            i = pr[1]
            continue
        if statement[i] != "{":
            i += 1
            continue
        depth, k = 1, i + 1
        while k < len(statement) and depth:
            pr = span_at(k)
            if pr:
                k = pr[1]
                continue
            if statement[k] in "([{":
                depth += 1
            elif statement[k] in ")]}":
                depth -= 1
            k += 1
        if depth:
            raise ValueError(
                f"transpile_duckdb: unbalanced '{{' at: {statement[i:i+40]!r}"
            )
        inner = statement[i + 1 : k - 1]
        fields: list[str] = []
        for pair in _split_top(inner, ","):
            kv = _split_top(pair, ":")
            if len(kv) != 2 or not re.fullmatch(
                r"'(?:[^']|'')*'", kv[0].strip()
            ):
                raise ValueError(
                    "transpile_duckdb: struct literal field must be "
                    f"'key': value (got {pair.strip()!r})"
                )
            fields.append(f"{kv[0].strip()}, {kv[1].strip()}")
        # MAP {'k': v} prefix → a map, not a struct
        j = i - 1
        while j >= 0 and statement[j].isspace():
            j -= 1
        w = j
        while w >= 0 and statement[w] in _IDENT_CHARS:
            w -= 1
        if statement[w + 1 : j + 1].upper() == "MAP":
            return (
                statement[: w + 1]
                + f"map({', '.join(fields)})"
                + statement[k:]
            )
        return (
            statement[:i]
            + f"named_struct({', '.join(fields)})"
            + statement[k:]
        )
    return None


def _rewrite_power(statement: str) -> str:
    """DuckDB's ``**`` operator → power(l, r) (Spark's ``^`` is xor)."""
    for _ in range(100):
        spans = _spans_of(statement)

        def span_at(i: int) -> tuple[int, int] | None:
            for s, e in spans:
                if s <= i < e:
                    return (s, e)
            return None

        pos = None
        i = 0
        while i < len(statement) - 1:
            pr = span_at(i)
            if pr:
                i = pr[1]
                continue
            if statement[i] == "*" and statement[i + 1] == "*":
                pos = i
                break
            i += 1
        if pos is None:
            return statement
        j = pos - 1
        while j >= 0 and statement[j].isspace():
            j -= 1
        ls = _base_start(statement, j, spans)
        r0 = pos + 2
        while r0 < len(statement) and statement[r0].isspace():
            r0 += 1
        re_ = _forward_primary(statement, r0, spans)
        left = statement[ls : j + 1]
        right = statement[r0:re_]
        statement = (
            statement[:ls] + f"power({left}, {right})" + statement[re_:]
        )
    raise ValueError("transpile_duckdb: power rewriting did not stabilize")


def _forward_primary(s: str, i: int, spans: list[tuple[int, int]]) -> int:
    """End index of the primary expression starting at ``i``: an optional
    sign, then a literal / identifier chain / call / parenthesized group,
    with trailing ``(…)``, ``[…]`` and ``.field`` links."""

    def span_at(k: int) -> tuple[int, int] | None:
        for a, b in spans:
            if a <= k < b:
                return (a, b)
        return None

    if i < len(s) and s[i] in "+-":
        i += 1
        while i < len(s) and s[i].isspace():
            i += 1
    pr = span_at(i)
    if pr:
        i = pr[1]
    elif i < len(s) and (s[i].isdigit() or s[i] == "."):
        while i < len(s) and (s[i].isdigit() or s[i] == "."):
            i += 1
    elif i < len(s) and s[i] in _IDENT_CHARS:
        while i < len(s) and s[i] in _IDENT_CHARS:
            i += 1
    elif i < len(s) and s[i] in "([":
        pass  # handled by the trailing-link loop below
    else:
        raise ValueError(
            f"transpile_duckdb: cannot parse '**' right operand at: {s[i:i+40]!r}"
        )
    while i < len(s):
        if s[i] in "([":
            opener, closer = s[i], ")" if s[i] == "(" else "]"
            depth, i = 1, i + 1
            while i < len(s) and depth:
                pr = span_at(i)
                if pr:
                    i = pr[1]
                    continue
                if s[i] == opener:
                    depth += 1
                elif s[i] == closer:
                    depth -= 1
                i += 1
        elif s[i] == "." and i + 1 < len(s) and s[i + 1] in _IDENT_CHARS:
            i += 1
            while i < len(s) and s[i] in _IDENT_CHARS:
                i += 1
        else:
            break
    return i


def _rewrite_lateral_unnest(statement: str) -> str:
    """``FROM t, unnest(arr) AS u(x)`` → ``FROM t LATERAL VIEW
    explode(arr) u AS x`` (the comma-join lateral table function)."""
    pat = re.compile(r",\s*unnest\s*\(", re.IGNORECASE)
    while True:
        spans = _spans_of(statement)

        def span_at(i: int) -> tuple[int, int] | None:
            for a, b in spans:
                if a <= i < b:
                    return (a, b)
            return None

        m = None
        for cand in pat.finditer(statement):
            if span_at(cand.start()) is None:
                m = cand
                break
        if m is None:
            return statement
        depth, k = 1, m.end()
        while k < len(statement) and depth:
            pr = span_at(k)
            if pr:
                k = pr[1]
                continue
            if statement[k] == "(":
                depth += 1
            elif statement[k] == ")":
                depth -= 1
            k += 1
        alias = re.match(
            r"\s+AS\s+(\w+)\s*\(\s*(\w+)\s*\)", statement[k:], re.IGNORECASE
        )
        if depth or not alias:
            return statement  # not the narrow shape — leave for Catalyst
        args = statement[m.end() : k - 1]
        statement = (
            statement[: m.start()]
            + f" LATERAL VIEW explode({args}) {alias.group(1)} "
            + f"AS {alias.group(2)}"
            + statement[k + alias.end() :]
        )


_CAST_UNNEST = re.compile(r"\bCAST\s*\(\s*unnest\s*\(", re.IGNORECASE)
_PARAM_INTERVAL = re.compile(r"\bINTERVAL\s*\(", re.IGNORECASE)
#: make_dt_interval(days, hours, mins, secs) argument slot per unit
_DT_INTERVAL_SLOT = {"DAY": 0, "HOUR": 1, "MINUTE": 2, "SECOND": 3}


def _balanced_end(s: str, i: int, spans: list[tuple[int, int]]) -> int:
    """Index just past the ')' matching the '(' that ``i`` points past."""
    depth = 1
    while i < len(s) and depth:
        hit = False
        for a, b in spans:
            if a <= i < b:
                i, hit = b, True
                break
        if hit:
            continue
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError(f"transpile_duckdb: unbalanced '(' near: {s[i-40:i]!r}")
    return i


def _rewrite_cast_unnest(statement: str) -> str:
    """``CAST(unnest(X) AS T)`` → ``unnest(transform(X, v -> CAST(v AS
    T)))``: Spark generators must be top-level select items, so the
    enclosing cast is pushed INSIDE the array instead — identical
    semantics, and the later rename pass turns unnest into explode."""
    while True:
        spans = _spans_of(statement)
        m = next(
            (
                c
                for c in _CAST_UNNEST.finditer(statement)
                if not any(a <= c.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            return statement
        inner_end = _balanced_end(statement, m.end(), spans)  # past unnest's ')'
        tail = re.match(
            r"\s*AS\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*\)",
            statement[inner_end:],
            re.IGNORECASE,
        )
        if not tail:
            raise ValueError(
                "transpile_duckdb: cannot parse CAST(unnest(...) AS T) at: "
                f"{statement[m.start():m.start() + 60]!r}"
            )
        x = statement[m.end() : inner_end - 1]
        t = tail.group(1)
        statement = (
            statement[: m.start()]
            + f"unnest(transform({x}, __v -> CAST(__v AS {t})))"
            + statement[inner_end + tail.end() :]
        )


def _rewrite_param_interval(statement: str) -> str:
    """``INTERVAL (expr) UNIT`` (DuckDB's parameterized interval) →
    ``make_dt_interval(...)`` with ``expr`` in the unit's slot — Spark
    interval literals take constants only. Literal ``INTERVAL 15
    MINUTE`` spellings (no parenthesis) are shared syntax and pass
    through untouched."""
    while True:
        spans = _spans_of(statement)
        m = next(
            (
                c
                for c in _PARAM_INTERVAL.finditer(statement)
                if not any(a <= c.start() < b for a, b in spans)
            ),
            None,
        )
        if m is None:
            return statement
        end = _balanced_end(statement, m.end(), spans)
        unit = re.match(
            r"\s*(DAY|HOUR|MINUTE|SECOND)S?\b", statement[end:], re.IGNORECASE
        )
        if not unit:
            raise ValueError(
                "transpile_duckdb: INTERVAL (expr) must be followed by "
                f"DAY/HOUR/MINUTE/SECOND at: {statement[m.start():m.start()+60]!r}"
            )
        expr = statement[m.end() : end - 1]
        args = ["0", "0", "0", "0"]
        args[_DT_INTERVAL_SLOT[unit.group(1).upper()]] = f"({expr})"
        statement = (
            statement[: m.start()]
            + f"make_dt_interval({', '.join(args)})"
            + statement[end + unit.end() :]
        )


_EXCLUDE_PARENS = re.compile(r"(\*\s*)EXCLUDE\s*\(", re.IGNORECASE)
_EXCLUDE_BARE = re.compile(r"(\*\s*)EXCLUDE\s+([A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE)


def _rewrite_exclude(statement: str) -> str:
    """DuckDB ``* EXCLUDE (a, b)`` / ``* EXCLUDE a`` → Spark
    ``* EXCEPT (a, b)`` — same column-subtraction star, different
    keyword. Only the star-adjacent spelling rewrites; EXCLUDE as a
    plain identifier elsewhere is untouched."""
    parts = re.split(rf"({_PROTECTED_SRC})", statement, flags=re.VERBOSE)
    for i in range(0, len(parts), 2):
        p = _EXCLUDE_PARENS.sub(r"\1EXCEPT (", parts[i])
        parts[i] = _EXCLUDE_BARE.sub(r"\1EXCEPT (\2)", p)
    return "".join(parts)


#: clause keywords that terminate a QUALIFY predicate at depth 0.
_QUALIFY_TERMINATORS = ("ORDER", "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT")


def _any_depth_keyword(
    s: str, kw: str, start: int = 0
) -> tuple[int, int | None] | None:
    """(pos, innermost enclosing '(' index) of the first unprotected,
    word-bounded ``kw`` at ANY depth at or after ``start``; None when
    absent. The paren stack is tracked from the string start so
    ``start`` never desynchronizes scope depth."""
    pat = re.compile(rf"{kw}\b", re.IGNORECASE)
    stack: list[int] = []
    i = 0
    while i < len(s):
        m = _PROTECTED.match(s, i)
        if m:
            i = m.end()
            continue
        c = s[i]
        if c == "(":
            stack.append(i)
        elif c == ")":
            if stack:
                stack.pop()
        elif i >= start and (i == 0 or s[i - 1] not in _IDENT_CHARS):
            mm = pat.match(s, i)
            if mm:
                return i, (stack[-1] if stack else None)
        i += 1
    return None


def _matching_paren(s: str, open_idx: int) -> int:
    depth = 0
    i = open_idx
    while i < len(s):
        m = _PROTECTED.match(s, i)
        if m:
            i = m.end()
            continue
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("transpile_duckdb: unbalanced parentheses")


def _top_keyword_positions(s: str, kw: str) -> list[int]:
    """All depth-0 unprotected word-bounded positions of ``kw`` in ``s``."""
    out: list[int] = []
    pat = re.compile(rf"{kw}\b", re.IGNORECASE)
    depth = 0
    i = 0
    while i < len(s):
        m = _PROTECTED.match(s, i)
        if m:
            i = m.end()
            continue
        c = s[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif depth == 0 and (i == 0 or s[i - 1] not in _IDENT_CHARS):
            if pat.match(s, i):
                out.append(i)
        i += 1
    return out


def _select_alias_map(select_list: str) -> dict[str, str]:
    """alias (lowercased) -> defining expression, for explicit ``expr AS
    alias`` items of a select list."""
    out: dict[str, str] = {}
    for item in _split_top(select_list, ","):
        it = item.strip()
        m = re.search(
            r"\bAS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", it, re.IGNORECASE
        )
        if m and not any(
            a <= m.start() < b for a, b in _spans_of(it)
        ):
            out[m.group(1).lower()] = it[: m.start()].strip()
    return out


def _expand_aliases(pred: str, aliases: dict[str, str]) -> str:
    """Replace word-bounded select-list alias references in ``pred`` with
    their parenthesized defining expressions (repeatedly, for aliases
    defined in terms of earlier aliases). Qualified references (``t.x``)
    and call positions (``x(...)``) are left alone. This removes every
    lateral-column-alias dependency from the injected predicate — Spark
    resolves lateral aliases in plain expressions but rejects them INSIDE
    window expressions (LATERAL_COLUMN_ALIAS_IN_WINDOW), and substitution
    sidesteps the whole class."""
    if not aliases:
        return pred
    for _ in range(5):
        changed = False
        parts = re.split(rf"({_PROTECTED_SRC})", pred, flags=re.VERBOSE)
        for i in range(0, len(parts), 2):
            def _sub(m: re.Match) -> str:
                nonlocal changed
                name = m.group(0)
                repl = aliases.get(name.lower())
                if repl is None:
                    return name
                start = m.start()
                before = m.string[:start].rstrip()
                after = m.string[m.end() :].lstrip()
                if before.endswith(".") or after.startswith("("):
                    return name
                changed = True
                return f"({repl})"

            parts[i] = re.sub(r"\b[A-Za-z_][A-Za-z0-9_]*\b", _sub, parts[i])
        pred = "".join(parts)
        if not changed:
            return pred
    return pred


def _rewrite_qualify_branch(s: str) -> str:
    """Rewrite the first depth-0 QUALIFY in ``s`` (a SELECT statement or
    set-operation branch) into the subquery-plus-WHERE form::

        SELECT <list> FROM … QUALIFY <pred> <tail>
        → SELECT * EXCEPT (__qualify) FROM
            (SELECT <list>, (<pred>) AS __qualify FROM …) WHERE __qualify <tail>

    The predicate is computed INSIDE the subquery with select-list alias
    references textually EXPANDED to their defining expressions
    (:func:`_expand_aliases`), so alias references (aggregate and window
    aliases included, even inside OVER clauses), inline window
    expressions, and base columns absent from the select list all work —
    the three QUALIFY idioms. Catalyst de-duplicates the repeated window
    spec, so expansion costs nothing at runtime."""
    q = _find_top_keyword(s, "QUALIFY")
    assert q is not None
    q_start, q_end = q
    after = s[q_end:]
    term_rel = [
        pos
        for kw in _QUALIFY_TERMINATORS
        for pos in _top_keyword_positions(after, kw)[:1]
    ]
    pred_end_rel = min(term_rel) if term_rel else len(after)
    pred = after[:pred_end_rel].strip()
    tail = after[pred_end_rel:]

    sel_positions = [p for p in _top_keyword_positions(s[:q_start], "SELECT")]
    if not sel_positions:
        raise ValueError("transpile_duckdb: QUALIFY without an owning SELECT")
    sp = sel_positions[-1]
    body = s[sp:q_start]
    if re.match(r"SELECT\s+DISTINCT\b", body, re.IGNORECASE):
        raise ValueError(
            "transpile_duckdb: QUALIFY combined with SELECT DISTINCT is "
            "not supported (DISTINCT applies after QUALIFY and the "
            "subquery rewrite cannot preserve that ordering) — "
            "deduplicate in an outer query instead"
        )
    if any(
        re.match(r"GROUP\s+BY\s+ALL\b", body[p:], re.IGNORECASE)
        for p in _top_keyword_positions(body, "GROUP")
    ):
        raise ValueError(
            "transpile_duckdb: QUALIFY combined with GROUP BY ALL is not "
            "supported (the injected predicate column would change what "
            "ALL resolves to) — spell out the grouping keys"
        )
    from_kw = _find_top_keyword(body, "FROM")
    if from_kw is None:
        raise ValueError(
            "transpile_duckdb: QUALIFY requires a FROM clause in its SELECT"
        )
    select_list = body[len("SELECT") : from_kw[0]]
    pred = _expand_aliases(pred, _select_alias_map(select_list))
    extended = (
        body[: from_kw[0]].rstrip()
        + f", ({pred}) AS __qualify "
        + body[from_kw[0] :]
    )
    return (
        s[:sp]
        + "SELECT * EXCEPT (__qualify) FROM ("
        + extended
        + ") WHERE __qualify"
        + (" " if tail and not tail[0].isspace() else "")
        + tail
    )


#: function names whose argument-shape rewrites expand into higher-order
#: lambdas — a scalar subquery in their arguments must be hoisted first
#: (Catalyst: UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY.HIGHER_ORDER_FUNCTION).
_HOF_EXPANDING = (
    "list_cosine_similarity",
    "list_sum",
    "list_avg",
    "list_reduce",
    "list_transform",
    "list_filter",
)

_SELECT_CLAUSE_END = (
    "WHERE", "GROUP", "HAVING", "WINDOW", "QUALIFY", "ORDER", "LIMIT",
    "OFFSET", "UNION", "INTERSECT", "EXCEPT",
)


def _enclosing_paren_stack(s: str, pos: int) -> list[int]:
    """Indices of the ``(`` characters enclosing ``pos``, outermost first."""
    stack: list[int] = []
    i = 0
    while i < pos:
        m = _PROTECTED.match(s, i)
        if m:
            i = m.end()
            continue
        if s[i] == "(":
            stack.append(i)
        elif s[i] == ")":
            if stack:
                stack.pop()
        i += 1
    return stack


def _find_subq_in_hof(statement: str) -> tuple[int, int] | None:
    """Span (start, end_exclusive) of the first ``(SELECT …)`` nested in
    the argument list of a HOF-expanding call; None when absent."""
    for m in re.finditer(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(", statement):
        if m.group(1).lower() not in _HOF_EXPANDING:
            continue
        spans = _spans_of(statement)
        if any(a <= m.start() < b for a, b in spans):
            continue
        open_idx = m.end() - 1
        close_idx = _find_balanced(statement, open_idx)
        sm = re.compile(r"\(\s*SELECT\b", re.IGNORECASE).search(
            statement, open_idx + 1, close_idx
        )
        if sm is None:
            continue
        if any(a <= sm.start() < b for a, b in spans):
            continue
        return sm.start(), _find_balanced(statement, sm.start()) + 1
    return None


def _hoist_hof_scalar_subqueries(statement: str) -> str:
    """Hoist scalar subqueries out of HOF-expanding call arguments:
    ``list_cosine_similarity(a, (SELECT …))`` becomes a 1-row
    ``CROSS JOIN (SELECT (SELECT …) AS __sqN) __sqtN`` on the owning
    SELECT plus a plain column reference in the argument — Catalyst
    broadcasts the row, and the lambda the call expands into no longer
    contains a subquery expression. Assumes the subquery is uncorrelated
    (DuckDB's in-lambda subqueries in this dialect are); a correlated one
    fails loudly at analysis as an unresolved column."""
    for n in range(16):
        found = _find_subq_in_hof(statement)
        if found is None:
            return statement
        sub_start, sub_end = found
        subq = statement[sub_start:sub_end]
        # owning SELECT scope: nearest enclosing paren group that opens
        # with SELECT (a subquery), else the whole statement
        scope_a, scope_b = 0, len(statement)
        for open_idx in reversed(_enclosing_paren_stack(statement, sub_start)):
            close_idx = _find_balanced(statement, open_idx)
            inner_start = _ws(statement, open_idx + 1)
            if re.compile(r"SELECT\b", re.IGNORECASE).match(statement, inner_start):
                scope_a, scope_b = open_idx + 1, close_idx
                break
        scope = statement[scope_a:scope_b]
        rel_sub = sub_start - scope_a
        sels = [p for p in _top_keyword_positions(scope, "SELECT") if p <= rel_sub]
        if not sels:
            raise ValueError(
                "transpile_duckdb: cannot hoist subquery out of HOF — no "
                "owning SELECT found"
            )
        sel = sels[-1]
        froms = [p for p in _top_keyword_positions(scope, "FROM") if p > sel]
        if not froms:
            raise ValueError(
                "transpile_duckdb: cannot hoist subquery out of HOF — the "
                "owning SELECT has no FROM clause to attach the 1-row join"
            )
        terms = [
            p
            for kw in _SELECT_CLAUSE_END
            for p in _top_keyword_positions(scope, kw)
            if p > froms[0]
        ]
        inject = min(terms) if terms else len(scope)
        ref = f"__sqt{n}.__sq{n}"
        joined = f" CROSS JOIN (SELECT {subq} AS __sq{n}) __sqt{n} "
        if inject <= rel_sub:  # subquery sits after FROM (e.g. in WHERE)
            new_scope = (
                scope[:inject]
                + joined
                + scope[inject:rel_sub]
                + ref
                + scope[rel_sub + len(subq) :]
            )
        else:  # subquery sits in the select list, before the join point
            new_scope = (
                scope[:rel_sub]
                + ref
                + scope[rel_sub + len(subq) : inject]
                + joined
                + scope[inject:]
            )
        statement = statement[:scope_a] + new_scope + statement[scope_b:]
    raise ValueError(
        "transpile_duckdb: more than 16 scalar subqueries inside "
        "higher-order-function arguments"
    )


#: clause keywords that terminate an ASOF ON condition at depth 0.
_ASOF_COND_END = (
    "WHERE", "GROUP", "ORDER", "LIMIT", "OFFSET", "UNION", "INTERSECT",
    "EXCEPT", "HAVING", "WINDOW", "QUALIFY", "JOIN", "ASOF", "LEFT",
    "RIGHT", "INNER", "CROSS", "FULL",
)

_INEQ = re.compile(r"(<=|>=|<|>)")
_QUAL_COL = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)\s*$")


def _split_top_and(cond: str) -> list[str]:
    """Split a boolean expression on depth-0 unprotected AND keywords."""
    parts: list[str] = []
    depth = 0
    i = 0
    start = 0
    pat = re.compile(r"AND\b", re.IGNORECASE)
    while i < len(cond):
        m = _PROTECTED.match(cond, i)
        if m:
            i = m.end()
            continue
        c = cond[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif depth == 0 and (i == 0 or cond[i - 1] not in _IDENT_CHARS):
            mm = pat.match(cond, i)
            if mm:
                parts.append(cond[start:i])
                i = mm.end()
                start = i
                continue
        i += 1
    parts.append(cond[start:])
    return parts


def _rewrite_asof_join(statement: str) -> str:
    """DuckDB ``ASOF [LEFT] JOIN rel alias ON <eq-keys AND ineq>`` →
    Spark ``[LEFT] JOIN LATERAL (SELECT * FROM rel alias WHERE <cond>
    ORDER BY <asof col> <dir> LIMIT 1) alias ON true``.

    The as-of match ("the single right row with the greatest/least
    timestamp satisfying the condition") is exactly a per-left-row
    ORDER BY + LIMIT 1 — Spark has no ASOF spelling but decorrelates the
    LATERAL form to the WindowGroupLimit + join plan (plan-asserted by
    ``lateral_top_orders``), so nothing here is a nested loop. The
    inequality conjunct names the as-of column and its direction:
    ``l.ts >= r.ts`` (right side small) → latest-at-or-before → DESC;
    ``l.ts <= r.ts`` → earliest-at-or-after → ASC. Strictness rides along
    in the WHERE untouched. Left-side text before ASOF is untouched —
    outer references stay correlated into the lateral subquery.
    RIGHT/FULL ASOF variants and multi-inequality conditions raise."""
    scan_from = 0
    for _ in range(64):
        hit = _any_depth_keyword(statement, "ASOF", start=scan_from)
        if hit is None:
            return statement
        pos, _open = hit
        s = statement
        i = pos + len("ASOF")
        i = _ws(s, i)
        left_kw = ""
        m = re.compile(r"(LEFT|RIGHT|FULL|INNER)\b", re.IGNORECASE).match(s, i)
        if m:
            kw = m.group(1).upper()
            if kw in ("RIGHT", "FULL"):
                raise ValueError(
                    f"transpile_duckdb: ASOF {kw} JOIN is not supported"
                )
            left_kw = "LEFT " if kw == "LEFT" else ""
            i = _ws(s, m.end())
        mj = re.compile(r"JOIN\b", re.IGNORECASE).match(s, i)
        if not mj:
            # ASOF used as an ordinary identifier (DuckDB keeps it
            # contextual) — not a join; skip this occurrence
            scan_from = pos + 1
            continue
        i = _ws(s, mj.end())
        if s[i] == "(":
            j = _find_balanced(s, i)
            rel = s[i : j + 1]
            i = _ws(s, j + 1)
        else:
            mr = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*").match(s, i)
            if not mr:
                raise ValueError("transpile_duckdb: expected relation after ASOF JOIN")
            rel = mr.group(0)
            i = _ws(s, mr.end())
        ma = re.compile(r"(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)\b", re.IGNORECASE).match(s, i)
        if not ma or ma.group(1).upper() == "ON":
            # a bare table/CTE name is its own alias (``ASOF LEFT JOIN c
            # ON …``); a parenthesized subquery has no name to fall back on
            if rel[0] == "(":
                raise ValueError(
                    "transpile_duckdb: ASOF JOIN on a subquery requires "
                    "an alias on the right relation"
                )
            alias = rel.rsplit(".", 1)[-1]
            rel_with_alias = rel
        else:
            alias = ma.group(1)
            rel_with_alias = f"{rel} {alias}"
            i = _ws(s, ma.end())
        mo = re.compile(r"ON\b", re.IGNORECASE).match(s, i)
        if not mo:
            raise ValueError("transpile_duckdb: expected ON after ASOF JOIN relation")
        cond_start = mo.end()
        # condition runs to the next depth-0 clause keyword or scope end
        ends = [
            p
            for kw in _ASOF_COND_END
            for p in _top_keyword_positions(s[cond_start:], kw)[:1]
        ]
        cond_end = cond_start + (min(ends) if ends else len(s) - cond_start)
        # ... but never past the enclosing scope's closing paren
        close = len(s)
        depth = 0
        k = cond_start
        while k < cond_end:
            mm = _PROTECTED.match(s, k)
            if mm:
                k = mm.end()
                continue
            if s[k] == "(":
                depth += 1
            elif s[k] == ")":
                depth -= 1
                if depth < 0:
                    close = k
                    break
            k += 1
        cond_end = min(cond_end, close)
        cond = s[cond_start:cond_end].strip()

        ineq_conjs = []
        for conj in _split_top_and(cond):
            mi = _ineq_on_alias(conj, alias)
            if mi is not None:
                ineq_conjs.append(mi)
        if len(ineq_conjs) != 1:
            raise ValueError(
                "transpile_duckdb: ASOF JOIN needs exactly one inequality "
                f"conjunct on the right alias, found {len(ineq_conjs)}"
            )
        asof_col, direction = ineq_conjs[0]
        replacement = (
            f"{left_kw}JOIN LATERAL (SELECT * FROM {rel_with_alias} "
            f"WHERE {cond} ORDER BY {alias}.{asof_col} {direction} LIMIT 1) "
            f"{alias} ON true "
        )
        statement = s[:pos] + replacement + s[cond_end:]
    raise ValueError("transpile_duckdb: more than 16 ASOF JOINs")


def _ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _find_balanced(s: str, i: int) -> int:
    """Index of the ``)`` matching the ``(`` at ``i`` (protected-aware)."""
    depth = 0
    while i < len(s):
        m = _PROTECTED.match(s, i)
        if m:
            i = m.end()
            continue
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("transpile_duckdb: unbalanced parentheses")


def _ineq_on_alias(conj: str, alias: str) -> tuple[str, str] | None:
    """If ``conj`` is ``x <op> y`` with exactly one side a qualified column
    of ``alias``, return (column, sort direction): the right side must be
    the LATEST at-or-before (DESC) when it sits on the small side of the
    inequality, the EARLIEST at-or-after (ASC) when on the large side."""
    m = _INEQ.search(conj)
    if not m:
        return None
    lhs, op, rhs = conj[: m.start()], m.group(1), conj[m.end() :]
    lq, rq = _QUAL_COL.match(lhs), _QUAL_COL.match(rhs)
    l_is = lq is not None and lq.group(1).lower() == alias.lower()
    r_is = rq is not None and rq.group(1).lower() == alias.lower()
    if l_is == r_is:  # both or neither side is the right alias
        return None
    if r_is:  # other <op> alias.col
        col = rq.group(2)
        return col, ("DESC" if op in (">", ">=") else "ASC")
    col = lq.group(2)  # alias.col <op> other
    return col, ("DESC" if op in ("<", "<=") else "ASC")


def _rewrite_qualify(statement: str) -> str:
    """Rewrite every QUALIFY clause (any nesting depth, innermost scope
    first) into the subquery form — Spark has no QUALIFY spelling."""
    for _ in range(32):
        hit = _any_depth_keyword(statement, "QUALIFY")
        if hit is None:
            return statement
        pos, open_idx = hit
        if open_idx is None:
            statement = _rewrite_qualify_branch(statement)
        else:
            close = _matching_paren(statement, open_idx)
            inner = statement[open_idx + 1 : close]
            statement = (
                statement[: open_idx + 1]
                + _rewrite_qualify_branch(inner)
                + statement[close:]
            )
    raise ValueError("transpile_duckdb: more than 32 QUALIFY clauses")


def _find_top_keyword(s: str, kw: str) -> tuple[int, int] | None:
    """(start, end) of the first depth-0, unprotected, word-bounded ``kw``."""
    pat = re.compile(rf"{kw}\b", re.IGNORECASE)
    depth, i = 0, 0
    while i < len(s):
        m = _PROTECTED.match(s, i)
        if m:
            i = m.end()
            continue
        c = s[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif depth == 0 and (i == 0 or s[i - 1] not in _IDENT_CHARS):
            mm = pat.match(s, i)
            if mm:
                return i, mm.end()
        i += 1
    return None


def _parse_comprehension(inner: str) -> tuple[str, str, str, str | None] | None:
    """DuckDB list comprehension ``[expr FOR var IN src [IF cond]]`` →
    (expr, var, src, cond) — mapped to transform(+filter), which is its
    exact semantics. Returns None when ``inner`` is a plain literal."""
    f = _find_top_keyword(inner, "FOR")
    if f is None:
        return None
    expr = inner[: f[0]].strip()
    rest = inner[f[1] :]
    n = _find_top_keyword(rest, "IN")
    if n is None:
        raise ValueError(
            f"transpile_duckdb: comprehension without IN: {inner[:60]!r}"
        )
    var = rest[: n[0]].strip()
    tail = rest[n[1] :]
    if not re.fullmatch(r"[A-Za-z_]\w*", var):
        raise ValueError(
            f"transpile_duckdb: comprehension variable {var!r} is not a "
            "plain identifier"
        )
    cnd = _find_top_keyword(tail, "IF")
    if cnd is None:
        return expr, var, tail.strip(), None
    return expr, var, tail[: cnd[0]].strip(), tail[cnd[1] :].strip()


def _base_start(statement: str, j: int, spans: list[tuple[int, int]]) -> int:
    """Start index of the expression ending at ``j`` (inclusive): an
    identifier chain (a.b.c), a call/paren group (f(x), (expr)), a prior
    bracket access (xs[1]), a quoted identifier or string literal, an
    ARRAY<...> type, or any dot-joined mix of these."""

    def span_at(i: int) -> tuple[int, int] | None:
        for s, e in spans:
            if s <= i < e:
                return (s, e)
        return None

    while True:
        pr = span_at(j)
        if pr:
            j = pr[0] - 1
        elif statement[j] in ")]":
            close, opener = statement[j], "(" if statement[j] == ")" else "["
            depth = 1
            j -= 1
            while j >= 0 and depth:
                pr = span_at(j)
                if pr:
                    j = pr[0] - 1
                    continue
                if statement[j] == close:
                    depth += 1
                elif statement[j] == opener:
                    depth -= 1
                j -= 1
            # a call: include the function name before '('
            while j >= 0 and statement[j] in _IDENT_CHARS:
                j -= 1
        elif statement[j] == ">":
            # ARRAY<...> type from an earlier bracket pass
            depth = 1
            j -= 1
            while j >= 0 and depth:
                if statement[j] == ">":
                    depth += 1
                elif statement[j] == "<":
                    depth -= 1
                j -= 1
            if depth:
                # a bare comparison like `x > [1]` reaches here: refuse
                # loudly instead of returning a garbled base expression
                raise ValueError(
                    "transpile_duckdb: '>' before a bracket is not an "
                    "ARRAY<...> type — cannot determine the access base at: "
                    f"{statement[max(j, 0):max(j, 0) + 40]!r}"
                )
            while j >= 0 and statement[j] in _IDENT_CHARS:
                j -= 1
        elif statement[j] in _IDENT_CHARS:
            while j >= 0 and statement[j] in _IDENT_CHARS:
                j -= 1
        else:
            raise ValueError(
                "transpile_duckdb: cannot find the base expression of a "
                f"bracket access before: {statement[j:j + 40]!r}"
            )
        if j >= 0 and statement[j] == ".":
            j -= 1
            continue
        return j + 1


# ---------------------------------------------------- non-call rewrites

#: Dialect-isms that are neither renames nor call rewrites (kept tiny and
#: explicit; anything not listed rides through to Catalyst unchanged).
#: ``//`` is DuckDB integer division; Spark spells it the ANSI way.
_INT_DIV = re.compile(r"//")
_BARE_VARCHAR = re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE)
# DuckDB CTE materialization hints (WITH x AS [NOT] MATERIALIZED (...)) are
# pure physical advice — Spark's parser has no spelling for them and the
# semantics without the hint are identical, so they are dropped.
_CTE_MATERIALIZED = re.compile(
    r"\bAS\s+(?:NOT\s+)?MATERIALIZED\s*\(", re.IGNORECASE
)
# A bare decimal-point literal is DECIMAL in Spark but behaves as float in
# DuckDB arithmetic (DuckDB's '/' always returns DOUBLE; Spark's decimal
# division stays DECIMAL and *renders* with trailing zeros — '100.0000' vs
# '100.0'). Suffixing 'D' makes the literal a Spark DOUBLE, reproducing
# the reference dialect's float arithmetic. Not applied when the literal
# is already part of a larger token (1.5e3, x1.0) — and literals inside
# strings/comments are protected like everything else.
_FLOAT_LITERAL = re.compile(
    r"(?<![\w.])(\d+\.\d+)(?![\w.eE])"
)


def transpile_duckdb(statement: str) -> str:
    """Rewrite a DuckDB-dialect (reference-dialect) SQL string to Spark SQL.

    Mechanics, in order:

    1. bracket rewrites — ``TYPE[]`` → ``ARRAY<TYPE>``, list literals →
       ``array(…)``, 1-based element access → ``try_element_at`` (also
       1-based, also NULL out of bounds);
    2. argument-shape rewrites (:data:`_ARG_REWRITERS`) — string_split,
       list_sum, scalar range, encode, regexp flags, xor, date_diff …;
    3. function-call renames found in :data:`DUCKDB_TO_SPARK_FN`
       (case-insensitive, word-boundary, call-position only — ``len(x)``
       rewrites, a column named ``len`` does not);
    4. ``extract('unit' FROM x)`` unquotes its unit (Spark wants it bare);
    5. non-call spellings outside protected tokens: ``//`` → ``DIV``, bare
       ``VARCHAR`` → ``STRING``, CTE ``MATERIALIZED`` hints dropped;
    6. literal re-escaping: DuckDB string literals are RAW where Spark
       treats backslash as an escape, so backslashes double; DuckDB
       ``"quoted identifiers"`` become Spark backticks (Spark reads
       double-quoted text as a string literal).

    String literals, quoted identifiers and comments are protected token
    classes throughout — a function name, ``//`` or apostrophe inside one
    never affects the code around it.
    """
    statement = _rewrite_brackets(statement)
    statement = _rewrite_struct_literals(statement)
    statement = _rewrite_power(statement)
    statement = _rewrite_lateral_unnest(statement)
    statement = _rewrite_cast_unnest(statement)
    statement = _rewrite_param_interval(statement)
    statement = _hoist_hof_scalar_subqueries(statement)
    statement = _rewrite_asof_join(statement)
    statement = _rewrite_qualify(statement)
    statement = _rewrite_exclude(statement)
    statement = _rewrite_calls_fixpoint(statement)

    def _sub(m: re.Match) -> str:
        if m.group("protected") is not None:
            return m.group(0)
        name = m.group("fn")
        return DUCKDB_TO_SPARK_FN.get(name.lower(), name)

    out = _TOKEN.sub(_sub, statement)
    parts = re.split(rf"({_PROTECTED_SRC})", out, flags=re.VERBOSE)
    # extract('minute' FROM ts) → extract(MINUTE FROM ts): the unit sits in
    # a protected literal, so the rewrite matches the (code, literal, code)
    # part triple around it.
    for i in range(0, len(parts) - 2, 2):
        if (
            re.search(r"\bextract\s*\(\s*$", parts[i], re.IGNORECASE)
            and parts[i + 1].startswith("'")
            and re.match(r"\s*FROM\b", parts[i + 2], re.IGNORECASE)
            and re.fullmatch(r"'(\w+)'", parts[i + 1])
        ):
            parts[i + 1] = parts[i + 1][1:-1].upper()
    for i, p in enumerate(parts):
        if i % 2 == 0:  # unprotected code
            p = _CTE_MATERIALIZED.sub(
                "AS (", _BARE_VARCHAR.sub("STRING", _INT_DIV.sub(" DIV ", p))
            )
            parts[i] = _FLOAT_LITERAL.sub(r"\1D", p)
        elif p.startswith("'"):  # string literal: raw → backslash-escaped
            parts[i] = p.replace("\\", "\\\\")
        elif p.startswith('"'):  # quoted identifier → backticks
            inner = p[1:-1].replace('""', '"')
            parts[i] = "`" + inner.replace("`", "``") + "`"
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
