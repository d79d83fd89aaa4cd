"""Text-analysis operators over the `documents` table (SURVEY.md §2.9).

Everything is built from JVM higher-order functions (split/transform/filter/
aggregate/xxhash64) — zero Python UDFs in these paths, so they run inside
whole-stage codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword lang-id heuristic.
#: Deliberately deterministic + dependency-free; real pipelines would swap in
#: fastText/CLD3 behind the same column contract.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "join", "filter"),
    "fr": ("le", "la", "et", "de", "jointure", "filtre"),
    "es": ("el", "la", "y", "de", "union", "filtro"),
    "de": ("der", "die", "und", "von", "verbund", "fenster"),
    "zh": ("的", "和", "是", "在", "连接", "过滤"),
}

#: BPE-ish tokenizer regex: runs of word chars OR single non-space symbols —
#: the classic pre-tokenization split used before byte-pair merging.
BPE_TOKEN_RE = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), "\\s+"), lambda t: t != "")


def bpe_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish regex (regexp_extract_all, JVM-side)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/token counts, mean token length,
    punctuation ratio, stopword ratio — the standard cheap quality filters of
    a pretraining data pipeline. Pure column expressions (one scan, no UDF)."""
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n_chars - F.length(F.translate(F.col(text_col), ".,!?;:'\"", ""))
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / n_tokens,
            4,
        ).alias("avg_token_len"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 4).alias("stopword_ratio"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    pre-embedding/pretraining chunker. Output: one row per chunk with
    (doc_id, chunk_idx, chunk_text, n_tokens).

    Stride = chunk_tokens - overlap. Chunk starts are a `sequence`, chunk
    bodies are `slice`+`array_join` — all JVM higher-order functions, so the
    row fan-out happens inside whole-stage codegen with no Python and no
    shuffle (a pure flatMap shape: input splits stay independent at 100 TB).
    The final (short) chunk is kept iff it starts before the token end.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: s < n,
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("chunk_text"),
            F.least(n - s, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword hits per language.

    Scale: builds one score column per language (5 JVM expressions) then takes
    a deterministic argmax (ties → lexicographically first language). One scan,
    no shuffle, no UDF.
    """
    toks = tokens(text_col)

    def _contains(words: tuple[str, ...]):
        # closure factory: Spark HOF lambdas must have exactly one parameter,
        # so the stopword array is captured, not passed as a default arg
        arr = F.array(*[F.lit(w) for w in words])
        return lambda t: F.array_contains(arr, t)

    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, _contains(sw))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_max(
        F.transform(
            scored,
            # invert lang ordering inside the tiebreak so array_max's
            # (hits desc, lang asc) pick is deterministic: max on struct
            # compares fields in order, so negate nothing — encode lang rank.
            lambda s: F.struct(
                s.getField("hits").alias("hits"),
                (-F.ascii(F.substring(s.getField("lang"), 1, 1))).alias("neg_l"),
                s.getField("lang").alias("lang"),
            ),
        )
    )
    return df.select(
        "doc_id", "lang", best.getField("lang").alias("lang_pred"), best.getField("hits").alias("hits")
    )


def winnow_fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 4
) -> DataFrame:
    """Winnowing-style document fingerprint (rolling min over token hashes).

    Each document maps to (a) a single 64-bit fingerprint (min token-window
    hash — usable as a cheap near-dup blocking key) and (b) the count of
    distinct window minima. All array ops, no explode, no shuffle.
    """
    toks = tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(hashes)
    mins = F.transform(
        F.sequence(F.lit(0), F.greatest(n - window, F.lit(0))),
        lambda i: F.array_min(F.slice(hashes, i + 1, window)),
    )
    return df.select(
        "doc_id",
        F.array_min(mins).alias("fingerprint"),
        F.size(F.array_distinct(mins)).alias("n_windows"),
    )
