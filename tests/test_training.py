"""Pins for in-engine gradient-descent training (operators/training.py):
oracle differential, independent pure-Python replay of the whole
trajectory, monotone training loss, and loud empty-input failure."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from sql4pandas_spark.operators.text import GOPHER_STOPWORDS
from sql4pandas_spark.operators.training import LR_NUM, SCALE

N_BUCKETS = 8
ROUNDS = 6


def _round_away(v: float) -> int:
    """round-half-away-from-zero — Spark's HALF_UP and DuckDB's round(),
    NOT Python's banker's rounding."""
    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def _py_features(texts):
    """Independent replay of hashed_feature_frame: whitespace-lowercase
    tokens, md5-prefix bucket hash, stopword-occurrence label."""
    stops = set(GOPHER_STOPWORDS)
    feats = []
    for text in texts:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if not toks:
            continue
        buckets = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % N_BUCKETS
            for t in toks
        ]
        y = 1 if sum(t in stops for t in toks) >= 2 else 0
        feats.append((buckets, len(toks), y))
    return feats


def _py_trajectory(feats):
    nd = len(feats)
    w = [0] * N_BUCKETS
    out = []
    for rnd in range(1, ROUNDS + 1):
        g = [0] * N_BUCKETS
        for buckets, n, y in feats:
            dot = sum(w[b] for b in buckets)  # exact int
            z = dot / (float(SCALE) * n)
            s = 0.5 + z / (2.0 * (1.0 + abs(z)))
            cu = _round_away((s - y) * float(SCALE) / n)
            for b in buckets:
                g[b] += cu
        w = [wb - math.floor(gb * LR_NUM / nd) for wb, gb in zip(w, g)]
        out.extend((rnd, b, g[b], w[b]) for b in range(N_BUCKETS))
    return out


@pytest.fixture(scope="module")
def doc_texts(duck):
    return [r[0] for r in duck.execute("SELECT text FROM documents ORDER BY doc_id").fetchall()]


def test_trajectory_matches_duckdb_oracle(spark, duck):
    import tests.conftest as cf
    from sql4pandas_spark.queries.catalog import load_catalog

    spec = load_catalog()["logreg_train_trajectory"]
    got = cf.normalize(spec.build(spark, cf.SF_SMALL).toPandas())
    exp = cf.normalize(duck.execute(spec.oracle).fetchdf())
    cf.assert_frames_match(got, exp, "logreg_train_trajectory")


def test_trajectory_matches_pure_python_replay(spark, doc_texts):
    """Triple point: Spark operator == DuckDB oracle == this from-scratch
    Python implementation. The replay shares no code with the operator
    (hashlib vs md5(), a list loop vs higher-order aggregate), so an
    engine-side expression quirk cannot hide."""
    import tests.conftest as cf
    from sql4pandas_spark.queries.catalog import load_catalog

    spec = load_catalog()["logreg_train_trajectory"]
    got = sorted(
        tuple(r) for r in spec.build(spark, cf.SF_SMALL).collect()
    )
    exp = sorted(_py_trajectory(_py_features(doc_texts)))
    assert got == exp


def test_training_loss_decreases_monotonically(doc_texts):
    """The trajectory must actually TRAIN: full-batch log-loss (true
    sigmoid) strictly decreases every round on the training corpus."""
    feats = _py_features(doc_texts)
    traj = _py_trajectory(feats)
    weights_by_round = {}
    for rnd, b, _, w in traj:
        weights_by_round.setdefault(rnd, [0] * N_BUCKETS)[b] = w

    def loss(w):
        tot = 0.0
        for buckets, n, y in feats:
            z = sum(w[b] for b in buckets) / (float(SCALE) * n)
            p = 1.0 / (1.0 + math.exp(-z))
            p = min(max(p, 1e-12), 1 - 1e-12)
            tot += -math.log(p) if y == 1 else -math.log(1 - p)
        return tot / len(feats)

    losses = [loss([0] * N_BUCKETS)] + [
        loss(weights_by_round[r]) for r in sorted(weights_by_round)
    ]
    assert all(b < a for a, b in zip(losses, losses[1:])), losses


def test_gradient_at_zero_weights_is_analytic(doc_texts):
    """Round 1 runs at w=0 → z=0 → s=0.5 exactly, so the per-doc unit
    contribution is round((0.5 - y) * 2^20 / n) — pin the closed form."""
    feats = _py_features(doc_texts)
    traj = _py_trajectory(feats)
    g1 = {b: g for rnd, b, g, _ in traj if rnd == 1}
    expect = {b: 0 for b in range(N_BUCKETS)}
    for buckets, n, y in feats:
        cu = _round_away((0.5 - y) * float(SCALE) / n)
        for b in buckets:
            expect[b] += cu
    assert g1 == expect


def test_count_vector_gradient_equals_per_occurrence(spark):
    """The r14 optimization folds each doc's token-bucket array into a
    |buckets|-count vector at checkpoint time; per-round dot products and
    gradients are then integer multiply-adds over the counts. Pin the
    equivalence against an explicit per-occurrence computation at NONZERO
    weights (round 1 alone would only exercise w=0)."""
    from pyspark.sql import functions as F

    from sql4pandas_spark.operators.training import (
        _count_vector,
        _round_gradient,
        hashed_feature_frame,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat and the hat sat"),
            (2, "a quick brown fox jumps over dogs"),
            (3, "of the people by the people for the people"),
            (4, "x y z"),
        ],
        "doc_id BIGINT, text STRING",
    )
    raw = hashed_feature_frame(df, n_buckets=N_BUCKETS)
    feat = raw.select(
        "doc_id", _count_vector(N_BUCKETS).alias("bcounts"), "n", "y"
    )
    # count vector must be the exact histogram of the bucket array
    for row in raw.select("doc_id", "buckets").join(
        feat.select("doc_id", "bcounts"), "doc_id"
    ).collect():
        hist = [0] * N_BUCKETS
        for b in row["buckets"]:
            hist[b] += 1
        assert list(row["bcounts"]) == hist, row["doc_id"]

    weights = [3 << 18, -(5 << 17), 0, 1 << 20, -(1 << 19), 7, -13, 1 << 16]
    got = _round_gradient(feat, weights)
    # independent per-occurrence replay (the pre-r14 formulation)
    exp = [0] * N_BUCKETS
    for row in raw.collect():
        dot = sum(weights[b] for b in row["buckets"])  # exact int
        z = dot / (float(SCALE) * row["n"])
        s = 0.5 + z / (2.0 * (1.0 + abs(z)))
        cu = _round_away((s - row["y"]) * float(SCALE) / row["n"])
        for b in row["buckets"]:
            exp[b] += cu
    assert got == exp


def test_empty_corpus_fails_loudly(spark):
    from sql4pandas_spark.operators.training import train_hashed_logreg

    empty = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="no documents"):
        train_hashed_logreg(empty)


def test_feature_frame_drops_tokenless_docs(spark):
    from sql4pandas_spark.operators.training import hashed_feature_frame

    df = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "   "), (3, "")],
        "doc_id BIGINT, text STRING",
    )
    rows = hashed_feature_frame(df).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["y"] == 1  # 'the' x2 + 'and' >= 2 stopword occurrences
    assert rows[0]["n"] == 5
