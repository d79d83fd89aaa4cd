"""Lexical retrieval scoring over the `documents` table (SURVEY.md §2.9).

BM25 is the quality-targeted *selection* primitive of a training-data
pipeline: score every document against a small set of query terms (a topic
probe, a quality rubric's keyword list, a contamination suspect's salient
n-grams) and keep/inspect the top scorers. The scale shape matters more
than the formula:

1. **Corpus statistics in ONE pass** — N, avgdl, and per-term document
   frequencies come from a single aggregate over the tokenized scan
   (`sum(array_contains(tokens, t))` per term — the term list is small by
   construction, so this is a fixed handful of counters, not a per-term
   shuffle). At 100 TB this is one map-side-combined pass producing one
   tiny row.

2. **Single-row broadcast stats join** — the stats row joins back to the
   corpus as a broadcast scalar (the idiomatic scalar-subquery shape; the
   plan is a 1-row BroadcastNestedLoopJoin, allowlisted in the plan
   audit). No driver collect, no second scan of anything but the corpus
   itself.

3. **Scoring is pure JVM** — tf per term is `size(filter(tokens, = t))`,
   the BM25 combination is arithmetic over those counters; whole-stage
   codegen end to end, zero Python in the row path. Top-k compiles to
   TakeOrderedAndProject (no global sort).

The idf variant is the Lucene/"BM25+1" form `ln(1 + (N - df + .5)/(df + .5))`
— always positive, so a term occurring in most documents still contributes
rather than flipping the score negative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql4pandas_spark.operators.text import tokens


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score against ``query_terms``.

    Returns ``(id_col, bm25)`` — score rounded to 4dp BEFORE the ordering
    so the top-k cut is reproducible across engines and runs (ties broken
    on ``id_col``). Documents matching no query term (or with NULL text,
    whose token array — and therefore score — is NULL) are excluded.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks_df = df.select(id_col, tokens(text_col).alias("_toks"))

    stats = toks_df.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.avg(F.size("_toks")).alias("_avgdl"),
        *[
            F.sum(
                F.when(F.array_contains("_toks", t), 1).otherwise(0)
            ).alias(f"_df_{i}")
            for i, t in enumerate(query_terms)
        ],
    )

    # k1*(1 - b + b*dl/avgdl): the length normalization shared by all terms.
    # A corpus with no tokens at all (avgdl = 0: every text empty or NULL)
    # has no defined score for anything — the NULLed avgdl propagates to a
    # NULL score and the >0 filter returns the correct empty result instead
    # of an ANSI DIVIDE_BY_ZERO abort (found by the property differential).
    avgdl = F.when(F.col("_avgdl") > 0, F.col("_avgdl"))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.size("_toks").cast("double") / avgdl
    )
    per_term = []
    for i, t in enumerate(query_terms):
        tf = F.size(F.filter("_toks", lambda x: x == F.lit(t))).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col(f"_df_{i}") + F.lit(0.5))
            / (F.col(f"_df_{i}") + F.lit(0.5))
        )
        per_term.append(idf * tf * F.lit(k1 + 1.0) / (tf + norm))
    score = F.round(sum(per_term), 4)

    return (
        toks_df.crossJoin(F.broadcast(stats))
        .select(id_col, score.alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N top-k rankings — the RAG-era hybrid
    retrieval default (Cormack et al. 2009): fuse a lexical ranking
    (:func:`bm25_topk`) with a semantic one (ANN cosine top-k) without
    comparing their incommensurable scores. Each input frame must be
    ``(id_col, <score>)`` ALREADY deterministically ordered (score desc,
    id asc — the contract every top-k in this repo meets) and already
    truncated to its candidate budget.

    ``rrf = Σ_sources 1/(k0 + rank)``, ranks 1-based per source. The
    contribution is computed as an INTEGER micro-score
    ``floor(1e9/(k0+rank))`` and summed as a BIGINT, so the fused total is
    exact and order-independent across engines/partitionings — the repo's
    integer-summation convention (a float Σ1/(k0+r) is commutative for 2
    sources but not associative for 3+). Output:
    ``(id_col, rrf_micro, n_sources)`` ordered (rrf_micro desc, n_sources
    desc, id asc) and cut to ``k``.

    Scale shape: ranks come from per-source row_number windows over frames
    the caller already truncated (candidate-budget-sized, NOT corpus-
    sized — a single-partition window over ≤ a few hundred rows); the
    fuse is one union + one groupBy over ≤ Σ budgets rows. The corpora
    behind the rankings never enter this operator."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    from pyspark.sql import Window

    ranked = []
    for i, r in enumerate(rankings):
        cols = r.columns
        if id_col not in cols or len(cols) != 2:
            raise ValueError(
                f"ranking {i} must be ({id_col}, <score>); got {cols}"
            )
        score = next(c for c in cols if c != id_col)
        w = Window.orderBy(F.col(score).desc(), F.col(id_col).asc())
        ranked.append(
            r.select(
                F.col(id_col),
                F.floor(
                    F.lit(1_000_000_000)
                    / (F.lit(k0) + F.row_number().over(w))
                ).cast("long").alias("_contrib"),
            )
        )
    allr = ranked[0]
    for r in ranked[1:]:
        allr = allr.unionByName(r)
    return (
        allr.groupBy(id_col)
        .agg(
            F.sum("_contrib").alias("rrf_micro"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
        )
        .orderBy(F.desc("rrf_micro"), F.desc("n_sources"), F.col(id_col))
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame,
    k_terms: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top ``k_terms`` TF-IDF terms per document — the unsupervised
    "what is this document about" primitive (keyword extraction, topic
    probes, routing documents to domain buckets in a mix plan).

    Where :func:`bm25_topk` scores the corpus against a FIXED handful of
    query terms (a few counters, no per-term shuffle), this is the
    full-vocabulary dual, and its scale shape is different on purpose:

    - one shuffle keyed (doc, term) for raw term counts (map-side combined);
    - one vocabulary-keyed shuffle for document frequencies — |vocab| rows,
      never |corpus| (tf rows collapse per doc first);
    - df joins back on the term key (sort-merge at vocab scale, broadcast
      when small — Catalyst chooses from stats);
    - corpus size N is a 1-row broadcast (same allowlisted scalar shape as
      BM25's stats row);
    - the final top-k per doc is a WindowGroupLimit, so only k rows per doc
      survive the map side of the last shuffle.

    Scoring: sklearn's smooth idf — ``tf * (ln((1+N)/(1+df)) + 1)`` with
    raw term counts — rounded to 4dp BEFORE ranking so the per-doc cut is
    reproducible across engines (ties broken on term asc). Documents with
    no tokens (empty or NULL text) contribute nothing and are absent from
    the output; N counts tokenized documents only.
    """
    toks_df = df.select(id_col, tokens(text_col).alias("_toks")).filter(
        F.size("_toks") > 0
    )
    tf = (
        toks_df.select(id_col, F.explode("_toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = toks_df.agg(F.count(F.lit(1)).alias("_n_docs"))

    idf = F.log(
        (F.lit(1.0) + F.col("_n_docs")) / (F.lit(1.0) + F.col("_df"))
    ) + F.lit(1.0)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(F.col("_tf").cast("double") * idf, 4).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k_terms)
        .select(id_col, "term", "tfidf", "rn")
    )


def stub_cross_encoder_scores(query: str, texts) -> list[int]:
    """Deterministic STAND-IN for a cross-encoder relevance model —
    score_e6 = md5-hash of "query | text" mod 1_000_001. This container
    has no torch/ONNX runtime; swap this function for a real model call
    (``model.predict([(query, t) for t in texts])``) and everything
    around it — batching, schema, ordering — is production-shaped. The
    hash stub is what lets the catalog entry carry an exact DuckDB
    oracle for the PLUMBING (the multimodal decode-stub discipline,
    operators/multimodal.py)."""
    import hashlib

    return [
        int(
            hashlib.md5(f"{query} | {t}".encode()).hexdigest()[:15], 16
        )
        % 1_000_001
        for t in texts
    ]


def rerank_with_model(
    candidates: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_fn=stub_cross_encoder_scores,
) -> DataFrame:
    """Cross-encoder reranking stage — the second hop of a two-stage
    retrieval stack: a cheap recall pass (BM25 / ANN / hybrid RRF)
    produces a SMALL candidate frame, and an expensive pairwise
    (query, document) model re-scores only those. This operator is the
    Arrow-batched model-inference shape for TEXT (the sibling of the
    multimodal decode/resize stubs): ``mapInPandas`` streams candidate
    batches through ``score_fn`` — a real cross-encoder amortizes model
    load per PARTITION and runs vectorized per Arrow batch; the default
    stub scorer is deterministic (md5-based) so the plumbing carries an
    exact cross-engine oracle.

    Scale shape: the model only ever sees the candidate frame (budget-
    sized by the recall stage — never the corpus), partitions score
    independently with no shuffle, and the output adds one
    ``rerank_score_e6`` column for the caller's top-k. The recall/
    precision split is the load-bearing design: at 100 TB the corpus
    never meets the expensive model.
    """
    from pyspark.sql import types as T

    fields = candidates.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField("rerank_score_e6", T.LongType())]
    )

    def score_batches(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["rerank_score_e6"] = score_fn(query, list(pdf[text_col]))
            yield pdf

    return candidates.mapInPandas(score_batches, schema=out_schema)


#: e6-integer NDCG position discounts, 1/log2(r+1) for ranks 1..10 —
#: quantized ONCE here (the PSI/surprisal convention) and spliced as
#: identical literals into Spark expressions and DuckDB oracles, so DCG
#: sums are exact BIGINT arithmetic with no transcendental in either
#: engine's hot path.
NDCG_DISC_E6: tuple[int, ...] = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)


def dcg_e6_expr(rank_col: str, gain_col: str):
    """Aggregate expression Σ gain·disc_e6[rank] over a ranked frame
    (ranks 1..len(NDCG_DISC_E6)) — the integer DCG@k building block of
    :data:`NDCG_DISC_E6`. Apply with ``.agg(dcg_e6_expr("r",
    "gain").alias("dcg_e6"))`` on a frame already truncated to the
    cutoff; ranks past the table index to NULL and would poison the sum
    loudly rather than silently under-count."""
    disc = F.element_at(
        F.array(*[F.lit(d).cast("long") for d in NDCG_DISC_E6]),
        F.col(rank_col).cast("int"),
    )
    return F.sum(F.col(gain_col).cast("long") * disc)
