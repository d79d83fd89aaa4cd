#!/usr/bin/env python
"""Scale probe for the fuzzy-key entity-resolution join (round 9).

The operator's contract (operators/joins.fuzzy_key_pairs) is that work
scales with DISTINCT KEY VALUES, never table rows, and that the banded
candidate join stays linear for name-like keys. This probe measures both:

- N synthetic person-name-like keys (diverse n-gram space — the declared
  regime) on the clean side, N//5 dirty copies with one deterministic
  character deletion;
- table-row invariance: the same key space replicated 20x in table rows
  must cost ~the same as 1x (the LSH runs on distinct values);
- key-count scaling: N -> 10N distinct keys should grow wall ~linearly,
  and candidate-pair volume should track true matches, not N^2.

Run:  python tools/fuzzy_probe.py [N ...]   # default: 10000 100000
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators.joins import fuzzy_key_pairs  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402

FIRST = ["al", "bet", "car", "dan", "el", "fra", "gus", "han", "iv", "jo"]
MID = ["an", "en", "in", "on", "ar", "er", "or", "il", "ul", "em"]
LAST = ["son", "berg", "ton", "field", "worth", "gard", "man", "sen", "ham", "ford"]


def make_names(spark, n: int):
    """Deterministic diverse name-like keys: 3-part syllable compositions,
    id-salted so every key is distinct (suffix digits keep uniqueness
    without collapsing the gram space)."""
    f = F.array(*[F.lit(x) for x in FIRST])
    m = F.array(*[F.lit(x) for x in MID])
    last = F.array(*[F.lit(x) for x in LAST])

    def pick(arr, salt):
        return F.element_at(arr, (F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(10)) + 1).cast("int"))

    return spark.range(n).select(
        F.concat(
            pick(f, 1), pick(m, 2), pick(last, 3), F.lit(" "),
            pick(f, 4), pick(m, 5), pick(last, 6), F.lit(" "),
            F.col("id").cast("string"),
        ).alias("name")
    )


def probe(spark, n: int) -> dict:
    clean = make_names(spark, n).repartition(8).cache()
    clean.count()
    pos = (F.pmod(F.xxhash64("name"), F.length("name") - 2) + 1).cast("int")
    dirty = (
        clean.filter(F.pmod(F.xxhash64("name", F.lit(9)), F.lit(5)) == 0)
        .select(
            F.concat(
                F.col("name").substr(F.lit(1), pos - 1),
                F.col("name").substr(pos + 1, F.length("name")),
            ).alias("name")
        )
        .cache()
    )
    n_dirty = dirty.count()

    best = pairs = None
    for _ in range(2):
        t0 = time.perf_counter()
        pairs = fuzzy_key_pairs(
            dirty, clean, "name", "name", max_distance=2, n_hashes=48, n_bands=24
        ).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    # row-invariance: replicate TABLE ROWS 20x (same key values)
    fat_clean = clean.crossJoin(F.broadcast(spark.range(20).select(F.lit(1).alias("_r")))).drop("_r")
    t0 = time.perf_counter()
    fat_pairs = fuzzy_key_pairs(
        dirty, fat_clean, "name", "name", max_distance=2, n_hashes=48, n_bands=24
    ).count()
    fat_s = time.perf_counter() - t0
    clean.unpersist()
    dirty.unpersist()
    return {
        "n_keys": n,
        "n_dirty": n_dirty,
        "pairs": pairs,
        "wall_s": round(best, 2),
        "rows_x20_wall_s": round(fat_s, 2),
        "rows_x20_pairs": fat_pairs,
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    spark = get_spark(app_name="s4ps-fuzzy-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = [probe(spark, n) for n in sizes]
    rep = {"sizes": out}
    if len(out) >= 2 and out[0]["wall_s"]:
        rep["wall_ratio"] = round(out[-1]["wall_s"] / out[0]["wall_s"], 2)
        rep["key_ratio"] = round(out[-1]["n_keys"] / out[0]["n_keys"], 2)
    print(json.dumps(rep))


if __name__ == "__main__":
    raise SystemExit(main())
