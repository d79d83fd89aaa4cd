"""Property differentials for the round-10 operators: prefix-filter exact
Jaccard vs a pure-Python all-pairs reference (random token corpora, random
thresholds — the lossless-recall theorem under adversarial shapes), the
count-min sketch vs a pure-Python replay of the identical grid plus the
never-undercount law vs collections.Counter, and mergeable weighted
sampling vs the global draw under random batch splits. Derandomized like
the other property files so a pass is reproducible.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["alpha", "beta", "gamma", "delta", "kappa", "sigma", "omega", "zeta"]


# ------------------------------------------- prefix-filter exact Jaccard


def _py_shingles(text: str, n: int = 3) -> frozenset:
    w = [t for t in text.lower().split() if t]
    if len(w) >= n:
        return frozenset(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))
    return frozenset([" ".join(w)]) if w else frozenset()


def _py_jaccard_pairs(docs: list[tuple[int, str]], threshold: float):
    out = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            (ia, ta), (ib, tb) = docs[i], docs[j]
            sa, sb = _py_shingles(ta), _py_shingles(tb)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                a, b = sorted((ia, ib))
                out.add((a, b, round(jac, 4)))
    return out


@st.composite
def jaccard_corpora(draw):
    n_docs = draw(st.integers(3, 8))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(1, 10))
        toks = [VOCAB[draw(st.integers(0, len(VOCAB) - 1))] for _ in range(n_tok)]
        docs.append((i, " ".join(toks)))
    thr = draw(st.sampled_from([0.2, 0.34, 0.5, 0.75, 1.0]))
    return docs, thr


@given(jaccard_corpora())
@settings(**_SETTINGS)
def test_prefix_filter_matches_python_allpairs(spark, case):
    from sql4pandas_spark.operators.dedup import prefix_filter_jaccard_pairs

    docs, thr = case
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(df, threshold=thr).collect()
    }
    assert got == _py_jaccard_pairs(docs, thr)


# ------------------------------------------------------- count-min sketch


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_cms(counts: Counter, depth: int, width: int):
    """Pure-Python replay of the identical grid (same seed-29 affine)."""
    from sql4pandas_spark.operators.dedup import MERSENNE31, _affine_params

    params = _affine_params(depth, seed=29)
    cells = Counter()
    for item, n in counts.items():
        hm = _py_hash60(item) % MERSENNE31
        for r, (a, b) in enumerate(params):
            cells[(r, ((a * hm + b) % MERSENNE31) % width)] += n

    def estimate(item: str) -> int:
        hm = _py_hash60(item) % MERSENNE31
        return min(
            cells.get((r, ((a * hm + b) % MERSENNE31) % width), 0)
            for r, (a, b) in enumerate(params)
        )

    return cells, estimate


@given(
    st.lists(st.sampled_from([f"t{i}" for i in range(40)]), min_size=1, max_size=200),
    st.sampled_from([(2, 8), (3, 16), (4, 64)]),
)
@settings(**_SETTINGS)
def test_cms_matches_python_replay_and_never_undercounts(spark, items, dw):
    from sql4pandas_spark.operators.sketches import cms_lookup, count_min_state

    depth, width = dw
    df = spark.createDataFrame([(i,) for i in items], "item string")
    state = count_min_state(df, "item", depth=depth, width=width)
    exact = Counter(items)
    cells, estimate = _py_cms(exact, depth, width)
    got_cells = {(r.row, r.col): r.n for r in state.collect()}
    assert got_cells == dict(cells)
    probe = spark.createDataFrame([(i,) for i in exact], "item string")
    got_est = {
        r.item: r.cms_n
        for r in cms_lookup(state, probe, "item", depth=depth, width=width).collect()
    }
    for item, n in exact.items():
        assert got_est[item] == estimate(item)
        assert got_est[item] >= n  # the never-undercount law


# ------------------------------------------- mergeable weighted sampling


@given(
    st.integers(10, 60),
    st.integers(2, 5),
    st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_merged_weighted_sample_matches_global_draw(spark, n, n_batches, k):
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.sampling import (
        merge_weighted_samples,
        weighted_sample_topk,
    )

    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 % 11) + 1).cast("double").alias("w"),
    )
    want = [tuple(r) for r in weighted_sample_topk(df, "w", k=k).collect()]
    states = [
        weighted_sample_topk(df.filter(F.col("doc_id") % n_batches == b), "w", k=k)
        for b in range(n_batches)
    ]
    got = [tuple(r) for r in merge_weighted_samples(states, k=k).collect()]
    assert got == want
