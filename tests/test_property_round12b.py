"""Pure-Python third-implementation property differentials for the
round-12 session-2 operators: the Gopher rule gate, the per-domain
boilerplate strip, and SQ8 quantized scoring. Same rationale as the PII
scrub property file — an independent reference implementation, so a
divergence in the shared Spark/DuckDB expression design cannot hide
behind the oracle. Derandomized like the other property files."""

from __future__ import annotations

import math
import re

import pytest

#: whole-catalog sweep / heavy property tier — deselected by default so
#: the standard run fits the driver's verification window (pytest.ini);
#: runs via `-m slow` and in the pre-handoff full-suite ritual.
pytestmark = pytest.mark.slow

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sql4pandas_spark.operators.text import GOPHER_STOPWORDS

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=20,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ------------------------------------------------------------- gopher gate

_GOPHER_LINES = [
    "the quick brown fox jumps over that lazy dog and runs to them",
    "- bullet item",
    "- another bullet",
    "trailing thought...",
    "word00 word01 word02 word03 word04 word05 word06 word07",
    "x y z",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "1234 5678 90",
    "",
]


def _ref_gopher(text: str, min_words: int, max_words: int) -> dict:
    w = [t for t in re.split(r"\s+", text) if t]
    lines = text.split("\n")
    n = len(w)
    sum_len = sum(len(t) for t in w)
    n_alpha = sum(1 for t in w if re.search("[A-Za-z]", t))
    n_bullet = sum(1 for line in lines if line.startswith("- "))
    n_ell = sum(1 for line in lines if line.endswith("..."))
    lw = [t.lower() for t in w]
    n_stop = sum(1 for s in GOPHER_STOPWORDS if s in lw)
    r = {
        "n_words": n,
        "r_word_count": min_words <= n <= max_words,
        "r_mean_word_len": sum_len >= 3 * n and sum_len <= 10 * n,
        "r_alpha_words": 5 * n_alpha > 4 * n,
        "r_bullet_lines": 10 * n_bullet < 9 * len(lines),
        "r_ellipsis_lines": 10 * n_ell < 3 * len(lines),
        "r_stopwords": n_stop >= 2,
    }
    r["keep"] = all(v for k, v in r.items() if k.startswith("r_"))
    return r


@given(
    st.lists(
        st.lists(st.sampled_from(_GOPHER_LINES), min_size=1, max_size=6),
        min_size=1,
        max_size=5,
    ),
    st.sampled_from([5, 10, 30]),
)
@settings(**_SETTINGS)
def test_gopher_rules_match_python_reference(spark, docs, min_words):
    from sql4pandas_spark.operators.text import gopher_rules

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(df, min_words=min_words).collect()
    }
    for i, text in rows:
        ref = _ref_gopher(text, min_words, 100_000)
        actual = {k: got[i][k] for k in ref}
        assert actual == ref, f"doc={text!r}: {actual} != {ref}"


# ------------------------------------------------------- boilerplate strip

_BP_LINES = ["NAV", "footer", "body one", "body two", "x", ""]


def _ref_strip(rows, min_pct: int, min_docs: int) -> dict:
    dom_docs = Counter(d for _, d, _ in rows if d is not None)
    votes: dict = defaultdict(Counter)
    for _, d, t in rows:
        if d is None:
            continue
        for line in set(t.split("\n")):
            votes[d][line] += 1
    bl = {
        d: {
            line
            for line, c in cnt.items()
            if dom_docs[d] >= min_docs and c * 100 >= dom_docs[d] * min_pct
        }
        for d, cnt in votes.items()
    }
    out = {}
    for i, d, t in rows:
        lines = t.split("\n")
        kept = [
            line for line in lines if d is None or line not in bl.get(d, set())
        ]
        out[i] = ("\n".join(kept), len(lines) - len(kept))
    return out


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a.com", "b.org", None]),
            st.lists(st.sampled_from(_BP_LINES), min_size=1, max_size=5),
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([30, 50, 100]),
)
@settings(**_SETTINGS)
def test_strip_boilerplate_matches_python_reference(spark, docs, min_pct):
    from sql4pandas_spark.operators.text import strip_boilerplate

    rows = [(i, d, "\n".join(lines)) for i, (d, lines) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines_removed"])
        for r in strip_boilerplate(df, min_pct=min_pct, min_docs=2).collect()
    }
    ref = _ref_strip(rows, min_pct, 2)
    assert got == ref


# ------------------------------------------------------------ SQ8 scoring

_GRID = st.integers(min_value=-20, max_value=20).map(lambda i: i / 8)


def _ref_sq8_sims(vecs: dict, qvec: list[float]) -> dict:
    dim = len(qvec)
    all_vecs = list(vecs.values()) + [qvec]
    scales = [max(abs(v[i]) for v in all_vecs) for i in range(dim)]

    def dq(v):
        out = []
        for x, s in zip(v, scales):
            if s > 0:
                r = x * 127.0 / s
                c = math.floor(r + 0.5) if r >= 0 else math.ceil(r - 0.5)
                c = max(-127.0, min(127.0, c))
                out.append(c * s / 127.0)
            else:
                out.append(0.0)
        return out

    qdq = dq(qvec)
    qn = math.sqrt(sum(x * x for x in qdq))
    sims = {}
    for vid, v in vecs.items():
        da = dq(v)
        nn = math.sqrt(sum(x * x for x in da))
        sims[vid] = (
            sum(a * b for a, b in zip(da, qdq)) / (nn * qn)
            if nn > 0 and qn > 0
            else None
        )
    return sims, scales


@given(
    st.integers(min_value=2, max_value=6),
    st.data(),
)
@settings(**_SETTINGS)
def test_sq8_sims_match_python_reference(spark, dim, data):
    from sql4pandas_spark.operators.similarity import sq8_query_topk

    n = data.draw(st.integers(min_value=2, max_value=8))
    draw_vec = st.lists(_GRID, min_size=dim, max_size=dim).filter(
        lambda v: any(x != 0 for x in v)
    )
    vecs = {i: data.draw(draw_vec) for i in range(1, n + 1)}
    qvec = data.draw(draw_vec)
    ref, scales = _ref_sq8_sims(vecs, qvec)
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["sim_q8"]
        for r in sq8_query_topk(df, qvec, k=n, scales=scales).collect()
    }
    assert set(got) == set(ref)
    for vid, sim in ref.items():
        assert abs(got[vid] - round(sim, 4)) <= 1e-4 + 1e-9, (
            f"vec {vid}: spark={got[vid]} py={sim}"
        )


# ------------------------------------------------------- html extraction

_HTML_FRAGS = [
    "<p>hello <b>world</b></p>",
    "<script>if (1 < 2) x();</script>",
    "<style>p {color:red}</style>",
    "<head><title>t</title></head>",
    "<!-- note -->",
    "&amp;lt;keep&amp;gt;",
    "&lt;i&gt;lit&lt;/i&gt;",
    "plain words",
    "<br>",
    "<li>item</li>",
    "  \t ",
    "&quot;q&quot; &#39;s&#39; x&nbsp;y",
    "<DIV>block</DIV>",
]


def _ref_html_to_text(html: str) -> str:
    from sql4pandas_spark.operators.text import (
        HTML_ENTITIES,
        HTML_STRIP_STAGES,
        HTML_WS_STAGES,
    )

    out = html
    for pat, repl in HTML_STRIP_STAGES:
        out = re.sub(pat, repl.replace("\\", "\\\\"), out)
    for ent, ch in HTML_ENTITIES:
        out = out.replace(ent, ch)
    for pat, repl in HTML_WS_STAGES:
        out = re.sub(pat, repl.replace("\\", "\\\\"), out)
    return out


@given(
    st.lists(st.sampled_from(_HTML_FRAGS), min_size=1, max_size=8),
    st.sampled_from(["", " ", "\n"]),
)
@settings(**_SETTINGS)
def test_html_to_text_matches_python_reference(spark, frags, sep):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import html_to_text

    html = sep.join(frags)
    df = spark.createDataFrame([(1, html)], "id long, html string")
    got = df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]
    assert got == _ref_html_to_text(html), f"html={html!r}"


# ---------------------------------------------------- integer PageRank

_NODE_IDS = list(range(6))


def _ref_pagerank(edges, iterations=5, damping=85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    if n == 0:
        return {}
    base = (10**9 * (100 - damping) // 100) // n
    outdeg = Counter(a for a, _ in edges)
    rank = {v: 10**9 // n for v in nodes}
    for _ in range(iterations):
        s = dict.fromkeys(nodes, 0)
        for a, b in edges:
            s[b] += rank[a] // outdeg[a]
        rank = {v: base + damping * s[v] // 100 for v in nodes}
    return rank


@given(
    st.sets(
        st.tuples(st.sampled_from(_NODE_IDS), st.sampled_from(_NODE_IDS))
        .filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=14,
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_pagerank_matches_python_reference(spark, edges, iterations):
    from sql4pandas_spark.operators.graph import pagerank

    edf = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
    )
    got = {
        r["node"]: r["rank_e9"]
        for r in pagerank(edf, iterations=iterations).collect()
    }
    ref = {
        f"n{v}": r
        for v, r in _ref_pagerank(sorted(edges), iterations).items()
    }
    assert got == ref, f"edges={sorted(edges)}"


# --------------------------------------------------- BPE merge training

_BPE_WORDS = ["a", "b", "c", "ab", "x1"]


def _ref_bpe(texts, n_merges):
    docs = [
        [t for t in re.split(r"\s+", txt.lower()) if re.fullmatch("[a-z0-9]+", t)]
        for txt in texts
    ]
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w in docs:
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] += 1
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append((best[0], best[1], counts[best]))
        out_docs = []
        for w in docs:
            out, i = [], 0
            while i < len(w):
                if (
                    i + 1 < len(w)
                    and w[i] == best[0]
                    and w[i + 1] == best[1]
                ):
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            out_docs.append(out)
        docs = out_docs
    return merges


@given(
    st.lists(
        st.lists(st.sampled_from(_BPE_WORDS), min_size=0, max_size=6).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_bpe_learn_merges_matches_python_reference(spark, texts, n_merges):
    from sql4pandas_spark.operators.text import bpe_learn_merges

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = _ref_bpe(texts, n_merges)
    if len(want) < n_merges:
        # corpus exhausts its pairs early — the round-13 contract is a
        # LOUD failure (fixed-round unrolled oracles can't replay a
        # short result), so the engine must raise, not truncate
        with pytest.raises(ValueError, match="exhausted adjacent pairs"):
            bpe_learn_merges(df, n_merges=n_merges)
    else:
        got = bpe_learn_merges(df, n_merges=n_merges)
        assert got == want, f"texts={texts!r}"


# --------------------------------------- composed crawl-curation chain


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a.com", "b.org"]),
            st.lists(st.sampled_from(_HTML_FRAGS), min_size=1, max_size=5),
        ),
        min_size=2,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_crawl_chain_matches_composed_python_references(spark, pages):
    """The chain must equal the composition of the three independent
    Python references: extract, then per-domain frequent-line strip on
    the EXTRACTED lines, then the gopher rules on the CLEANED text —
    ordering and data flow are part of the contract."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import (
        gopher_rules,
        html_to_text,
        strip_boilerplate,
    )

    rows = [(i, d, "".join(frags)) for i, (d, frags) in enumerate(pages)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, html string")
    extracted = df.select(
        "doc_id", "domain", html_to_text(F.col("html")).alias("text")
    )
    stripped = strip_boilerplate(extracted, min_pct=60, min_docs=2)
    gated = gopher_rules(
        stripped.select("doc_id", F.col("clean_text").alias("text")),
        min_words=5,
    )
    got = {
        r["doc_id"]: (r["n_words"], r["keep"]) for r in gated.collect()
    }
    ref_extracted = [
        (i, d, _ref_html_to_text(h)) for i, d, h in rows
    ]
    ref_stripped = _ref_strip(ref_extracted, 60, 2)
    for i, _, _ in rows:
        clean, _ = ref_stripped[i]
        ref = _ref_gopher(clean, 5, 100_000)
        assert got[i] == (ref["n_words"], ref["keep"]), (
            f"doc {i}: clean={clean!r}"
        )


# ------------------------------------ vote-store replay idempotence


def test_boilerplate_vote_store_replay_is_idempotent(spark, tmp_path):
    """Replaying the last uncommitted vote batch (crash recovery)
    overwrites its own version and yields the identical state — the
    additive store's exactly-once contract applied to the boilerplate
    votes."""
    from sql4pandas_spark.operators.text import (
        BOILERPLATE_STATE_SCHEMA,
        boilerplate_votes,
        merge_boilerplate_votes,
    )
    from sql4pandas_spark.streaming import sketches

    df = spark.createDataFrame(
        [(1, "a.com", "NAV\nx"), (2, "a.com", "NAV\ny")],
        "doc_id long, domain string, text string",
    )
    root = str(tmp_path / "votes")
    sketches.empty_state(spark, BOILERPLATE_STATE_SCHEMA, root)
    v = boilerplate_votes(df)
    sketches.sketch_apply_batch(v, root, merge_boilerplate_votes, 0)
    def read_state():
        return sorted(
            (tuple(r) for r in spark.read.parquet(f"{root}/v1").collect()),
            key=lambda t: (t[0], t[1] is not None, t[1] or 0),
        )

    first = read_state()
    sketches.sketch_apply_batch(v, root, merge_boilerplate_votes, 0)  # replay
    second = read_state()
    assert first == second
    # NAV voted once per doc -> count 2; doc counter row n=2
    nav_rows = [r for r in first if r[1] is not None]
    assert {r[2] for r in nav_rows} <= {1, 2}
    assert ("a.com", None, 2) in first
