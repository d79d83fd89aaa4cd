"""Property differentials for the round-6 operators that only had directed
tests: keep_best (random quality ties), split_leakage (boundary splits
including empty sides), temperature_mix (alpha edge cases 0 and 1,
single-stratum corpora), and heavy hitters at cardinality >> M with
randomized batch placement. Pure-Python references recompute each result
exactly; derandomized like the other property files so a pass is
reproducible.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sql4pandas_spark.operators.dedup import (
    keep_best_representative,
    split_leakage_audit,
)
from sql4pandas_spark.operators.sampling import temperature_sample
from sql4pandas_spark.operators.sketches import heavy_hitters_topk

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_HASH_SPAN = float(1 << 60)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- keep_best


@st.composite
def clustered_corpora(draw):
    n = draw(st.integers(1, 30))
    # qualities from a 4-value range: ties are the NORM, not the exception,
    # so the (quality desc, id asc) tie-break is exercised in every example
    quality = [draw(st.integers(0, 3)) for _ in range(n)]
    n_clusters = max(1, n // draw(st.integers(1, 4)))
    labels = [draw(st.integers(0, n_clusters - 1)) for _ in range(n)]
    return quality, labels


@given(clustered_corpora())
@settings(**_SETTINGS)
def test_keep_best_matches_python_argmax(spark, case):
    quality, labels = case
    docs = spark.createDataFrame(
        [(i, q) for i, q in enumerate(quality)], "doc_id long, n_chars long"
    )
    lab = spark.createDataFrame(
        [(i, c) for i, c in enumerate(labels)], "doc_id long, cluster_id long"
    )
    got = {
        (r.cluster_id, r.rep_doc_id, r.n_docs)
        for r in keep_best_representative(docs, lab).collect()
    }

    by_cluster: dict[int, list[int]] = defaultdict(list)
    for i, c in enumerate(labels):
        by_cluster[c].append(i)
    want = {
        (c, min(ids, key=lambda i: (-quality[i], i)), len(ids))
        for c, ids in by_cluster.items()
    }
    assert got == want


# ------------------------------------------------------------ split_leakage


@st.composite
def split_cases(draw):
    n = draw(st.integers(1, 30))
    n_clusters = max(1, n // draw(st.integers(1, 4)))
    labels = [draw(st.integers(0, n_clusters - 1)) for _ in range(n)]
    d = draw(st.integers(2, 5))
    # j spans the FULL closed range including both boundaries: j=0 is an
    # all-val split, j=d an all-train split (the empty-side edge cases)
    j = draw(st.integers(0, d))
    return labels, d, j


@given(split_cases())
@settings(**_SETTINGS)
def test_split_leakage_matches_python_reference(spark, case):
    labels, d, j = case
    n = len(labels)
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    lab = spark.createDataFrame(
        [(i, c) for i, c in enumerate(labels)], "doc_id long, cluster_id long"
    )
    row = split_leakage_audit(
        docs, lab, (F.col("doc_id") % d) < j
    ).collect()[0]

    is_train = [i % d < j for i in range(n)]
    per_cluster: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for i, c in enumerate(labels):
        per_cluster[c][0 if is_train[i] else 1] += 1
    n_train = sum(tr for tr, _ in per_cluster.values())
    n_val = sum(va for _, va in per_cluster.values())
    leaky = sum(1 for tr, va in per_cluster.values() if tr > 0 and va > 0)
    leaked = sum(va for tr, va in per_cluster.values() if tr > 0)
    assert (row.n_train, row.n_val, row.leaky_clusters, row.leaked_val_docs) == (
        n_train,
        n_val,
        leaky,
        leaked,
    )


# --------------------------------------------------------- temperature_mix


@st.composite
def temperature_cases(draw):
    n_strata = draw(st.integers(1, 4))  # 1 = the single-language corpus
    counts = [draw(st.integers(1, 40)) for _ in range(n_strata)]
    alpha = draw(st.sampled_from([0.0, 0.5, 1.0]))  # both declared edges
    target = draw(st.sampled_from([1, 5, 50]))
    return counts, alpha, target


@given(temperature_cases())
@settings(**_SETTINGS)
def test_temperature_sample_matches_python_reference(spark, case):
    counts, alpha, target = case
    rows, nid = [], 0
    for s, c in enumerate(counts):
        for _ in range(c):
            rows.append((nid, f"lang{s}"))
            nid += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r.doc_id
        for r in temperature_sample(
            df, "lang", alpha=alpha, target_total=target
        ).collect()
    }

    # reference replicates the operator's double arithmetic exactly:
    # w = n^alpha, frac = min(1, w/denom * target/n), keep iff
    # double(hash60(id)) < frac * 2^60
    w = [math.pow(float(c), alpha) for c in counts]
    denom = math.fsum(w)
    want = set()
    for i, lang_s in rows:
        s = int(lang_s[4:])
        frac = min(1.0, w[s] / denom * float(target) / counts[s])
        if float(_hash60(str(i))) < frac * _HASH_SPAN:
            want.add(i)
    assert got == want
    # alpha=1 must keep the NATURAL mix: one uniform rate for every stratum
    if alpha == 1.0 and len(counts) > 1:
        total = sum(counts)
        uniform = min(1.0, float(target) / total)
        for s, c in enumerate(counts):
            assert min(1.0, w[s] / denom * target / c) == uniform


# ---------------------------------------------------------- heavy hitters


@st.composite
def skewed_items(draw):
    n_distinct = draw(st.integers(10, 40))
    freqs = [draw(st.integers(1, 12)) for _ in range(n_distinct)]
    items: list[str | None] = []
    for i, f in enumerate(freqs):
        items.extend([f"item{i:02d}"] * f)
    if draw(st.booleans()):
        items.extend([None] * draw(st.integers(1, 12)))
    # randomized batch placement: a permutation seed + partition count
    # scatter each item's occurrences across Arrow batches
    seed = draw(st.integers(0, 1 << 30))
    n_parts = draw(st.integers(1, 4))
    k = draw(st.integers(1, 5))
    return items, seed, n_parts, k


def _true_order(c: Counter) -> list[tuple]:
    # the operator's ordering: n desc, item asc with NULLS FIRST
    return sorted(
        c.items(), key=lambda p: (-p[1], p[0] is not None, p[0] or "")
    )


@given(skewed_items())
@settings(**_SETTINGS)
def test_heavy_hitters_is_omission_only_at_low_m(spark, case):
    """Cardinality >> M regime (M=4 vs up to ~41 distinct): the returned
    items must carry EXACT counts and correct mutual order — errors can
    only be omissions, never fabricated items or wrong counts."""
    items, seed, n_parts, k = case
    import random

    rng = random.Random(seed)
    shuffled = list(items)
    rng.shuffle(shuffled)
    df = spark.createDataFrame(
        [(it, rng.randrange(1000)) for it in shuffled], "item string, shard int"
    ).repartition(n_parts, "shard")

    res = heavy_hitters_topk(df, "item", k=k, candidates_per_batch=4).collect()
    true = Counter(items)
    assert len(res) <= k
    for r in res:
        assert r.item in true or (r.item is None and None in true)
        assert r.n == true[r.item], (r.item, r.n, true[r.item])
    got_order = [(r.item, r.n) for r in res]
    assert got_order == sorted(
        got_order, key=lambda p: (-p[1], p[0] is not None, p[0] or "")
    )


@given(skewed_items())
@settings(**_SETTINGS)
def test_heavy_hitters_exact_when_m_covers_cardinality(spark, case):
    """M >= distinct cardinality makes the sketch EXACT regardless of how
    occurrences land in batches — the accuracy contract's guarantee case."""
    items, seed, n_parts, k = case
    import random

    rng = random.Random(seed)
    shuffled = list(items)
    rng.shuffle(shuffled)
    df = spark.createDataFrame(
        [(it, rng.randrange(1000)) for it in shuffled], "item string, shard int"
    ).repartition(n_parts, "shard")

    true = Counter(items)
    res = heavy_hitters_topk(
        df, "item", k=k, candidates_per_batch=len(true)
    ).collect()
    want = _true_order(true)[:k]
    # ties at the k-th count boundary are broken identically (item asc,
    # NULLS FIRST) on both sides, so exact list equality holds
    assert [(r.item, r.n) for r in res] == want


# ------------------------------------------------------- weighted sampling


@st.composite
def weighted_corpora(draw):
    n = draw(st.integers(1, 40))
    # weights include heavy skew, ties, and the excluded classes (0, None)
    weights = [
        draw(st.sampled_from([None, 0, 1, 1, 2, 5, 100, 10_000])) for _ in range(n)
    ]
    k = draw(st.integers(1, 10))
    return weights, k


@given(weighted_corpora())
@settings(**_SETTINGS)
def test_weighted_sample_matches_python_reference(spark, case):
    """The A-ES key, the exclusion rule, the 6dp rounding, and the
    (key desc, hash, id asc) cut must all replay exactly in pure Python.
    Ties (common under heavy weights, where ln(u)/w compresses to 0 at
    6dp) break on the pseudorandom portable hash, not ascending id — an
    id tie-break would systematically over-include low doc_ids."""
    from sql4pandas_spark.operators.sampling import weighted_sample_topk

    weights, k = case
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w long"
    )
    got = [(r.doc_id, r.skey) for r in weighted_sample_topk(df, "w", k=k).collect()]

    want = []
    for i, w in enumerate(weights):
        if w is None or w <= 0:
            continue
        h = _hash60(str(i))
        u = float(h + 1) / _HASH_SPAN
        want.append((i, _py_round6(math.log(u) / float(w)), h))
    want.sort(key=lambda p: (-p[1], p[2], p[0]))
    assert got == [(i, s) for i, s, _ in want[:k]]


def _py_round6(x: float) -> float:
    # Spark round() is HALF_UP on doubles (negative values round toward
    # zero at the .5 boundary under HALF_UP-on-magnitude semantics)
    import math as _m

    return _m.copysign(_m.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_weighted_sample_plan_is_take_ordered(spark):
    """Zero data-row shuffles: the top-k must compile to
    TakeOrderedAndProject, never a global sort Exchange."""
    from sql4pandas_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(i, i % 7 + 1) for i in range(100)], "doc_id long, w long"
    )
    plan = (
        weighted_sample_topk(df, "w", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0]
