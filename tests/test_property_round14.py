"""Round-14 operator property differentials: each new iterative/keyed
operator is replayed by an INDEPENDENT pure-Python implementation over
hypothesis-generated inputs — the pagerank "pure-Python integer replay"
discipline applied to doremi_reweight, label_propagation, gumbel_topk,
and crossmodel_surprisal. Derandomized like the other property files;
frames stay tiny (the differential checks semantics, not scale — the
scale probes in BASELINE.md cover that axis).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SCALE = 10**9


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------- doremi_reweight vs pure-Python integer replay


def _doremi_py(losses: dict[str, int], rounds: int) -> dict[str, int]:
    n = len(losses)
    w = {d: SCALE // n for d in losses}
    for _ in range(rounds):
        mean = sum(w[d] * losses[d] for d in losses) // sum(w.values())
        u = {
            d: (
                w[d]
                * max(1, 1_000_000 - 100_000_000 + (losses[d] - mean + 100_000_000))
            )
            // 1_000_000
            for d in losses
        }
        tot = sum(u.values())
        w = {d: (u[d] * SCALE) // tot for d in losses}
    return w


@given(
    losses=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        st.integers(min_value=0, max_value=20_000_000),
        min_size=1,
        max_size=6,
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_doremi_matches_python_replay(spark, losses, rounds):
    from sql4pandas_spark.operators.sampling import doremi_reweight

    df = spark.createDataFrame(
        [(d, v) for d, v in sorted(losses.items())],
        "domain string, loss_e6 long",
    )
    got = {
        r["domain"]: r["weight_e9"]
        for r in doremi_reweight(df, rounds=rounds, eta_denom=1).collect()
    }
    assert got == _doremi_py(losses, rounds)


# ---------------------- label_propagation vs pure-Python synchronous LPA


def _lpa_py(edges: list[tuple[str, str]], rounds: int) -> dict[str, str]:
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            votes = Counter(labels[u] for u in adj[v])
            top = max(votes.values())
            nxt[v] = min(l for l, c in votes.items() if c == top)
        labels = nxt
    return labels


@given(
    edges=st.lists(
        st.tuples(
            st.sampled_from("pqrstuv"), st.sampled_from("pqrstuv")
        ),
        min_size=1,
        max_size=12,
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_lpa_matches_python_replay(spark, edges, rounds):
    from sql4pandas_spark.operators.graph import label_propagation

    want = _lpa_py(edges, rounds)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=rounds).collect()
    }
    assert got == want


# ---------------------- gumbel_topk vs pure-Python key replay


@given(
    rows=st.dictionaries(
        st.integers(min_value=0, max_value=50),
        st.floats(
            min_value=-5.0, max_value=5.0, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=20,
    ),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**_SETTINGS)
def test_gumbel_topk_matches_python_replay(spark, rows, k):
    from sql4pandas_spark.operators.sampling import gumbel_topk

    def key(doc_id: int, lw: float):
        h = _hash60(f"dsir:{doc_id}")
        u = (h + 1) / float(1 << 60)
        return (round(lw - math.log(-math.log(u)), 6), h, doc_id)

    ranked = sorted(rows.items(), key=lambda kv: (-key(*kv)[0], key(*kv)[1], kv[0]))
    want = [doc for doc, _ in ranked[:k]]
    df = spark.createDataFrame(
        sorted(rows.items()), "doc_id long, logw double"
    )
    got = [r["doc_id"] for r in gumbel_topk(df, "logw", k).collect()]
    assert got == want


# ---------------------- crossmodel_surprisal vs pure-Python counter replay


@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcdef"), min_size=0, max_size=6),
            st.booleans(),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_crossmodel_surprisal_matches_python_replay(spark, docs):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.text import crossmodel_surprisal

    # the model slice must contain at least one token or N+V is 0 and
    # the operator's ln(N+V) OOV scalar is undefined — pin the guard
    # input shape rather than the degenerate corpus
    if not any(toks for toks, in_m in docs if in_m):
        docs = docs + [(["a"], True)]

    counts = Counter(t for toks, in_m in docs for t in toks if in_m)
    n, v = sum(counts.values()), len(counts)
    s_tok = {
        t: round(math.log((n + v) / (c + 1.0)) * 1e6) for t, c in counts.items()
    }
    s_oov = round(math.log(n + v) * 1e6)
    want = {
        i: (
            len(toks),
            sum(s_tok.get(t, s_oov) for t in toks),
        )
        for i, (toks, _) in enumerate(docs)
    }
    df = spark.createDataFrame(
        [(i, " ".join(toks), in_m) for i, (toks, in_m) in enumerate(docs)],
        "doc_id long, text string, m boolean",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_sum_e6"])
        for r in crossmodel_surprisal(df, F.col("m")).collect()
    }
    assert got == want
