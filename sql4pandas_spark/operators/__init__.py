"""LLM-data-pipeline operators (SURVEY.md §2.9) as pure DataFrame→DataFrame
transforms: deduplication (exact / MinHash-LSH / SimHash), similarity search
(brute-force + LSH-bucketed ANN), text analysis (tokenize, quality, lang-id,
fingerprints), multimodal column plumbing.

Design rule: nothing here collects rows to the driver except deliberately
broadcast-sized artifacts (a query vector, an embedding matrix declared small
enough to broadcast); everything else is joins/shuffles that Catalyst can
schedule on a 1000-executor cluster.
"""

from sql4pandas_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
