#!/usr/bin/env python
"""Measure the per-merge cost slope of character-level BPE training.

The round-13 verdict: the (word, count)-frame trainer's per-round work
is |vocab|-bounded, which makes 30k-merge training *plausible* — but
only a 50-merge probe was committed, so the slope was unproven. This
probe drives ``bpe_learn_merges_from_vocab`` to N merges (default 500)
over a deterministic zipfian vocabulary (50k distinct pseudo-words,
~364k symbols — the testdata corpus's own 31-word vocabulary exhausts
at ~107 merges, far too small to expose a slope) and prints one JSON
line per 25-merge bucket: bucket mean/max per-merge seconds and the
cumulative wall. The signal: per-merge time should be FLAT-to-falling
(the symbol count shrinks as merges proceed; the per-merge floor is
two Spark jobs — argmax + checkpoint — not data volume). A rising
slope would mean lineage or checkpoint state accumulating per round,
the failure mode localCheckpoint exists to prevent.

Run:  python tools/bpe_depth_probe.py [n_merges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql4pandas_spark.operators.text import bpe_learn_merges_from_vocab  # noqa: E402
from sql4pandas_spark.session import get_spark  # noqa: E402

N_WORDS = 50_000
BUCKET = 25


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spark = get_spark(app_name="s4ps-bpe-depth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # Deterministic zipfian (word, cnt) frame: pseudo-words are base-26
    # encodings of the index (3-10 chars, natural shared prefixes/
    # suffixes like a real vocabulary), counts 1 + 1e6 // (i + 1).
    ids = spark.range(N_WORDS)
    word = F.concat(
        F.lit("w"),
        F.conv(F.col("id").cast("string"), 10, 26),  # 0-9a-p alphabet
        F.substring(F.repeat(F.lit("xyz"), 3), 1, (F.col("id") % 8).cast("int")),
    )
    vocab = ids.select(
        F.lower(word).alias("word"),
        (F.lit(1) + F.lit(1_000_000) / (F.col("id") + 1)).cast("long").alias("cnt"),
    )
    rounds: list[float] = []
    t_start = time.time()

    def on_round(k: int, sec: float) -> None:
        rounds.append(sec)
        if k % BUCKET == 0:
            bucket = rounds[-BUCKET:]
            print(
                json.dumps(
                    {
                        "merge_k": k,
                        "bucket_mean_s": round(sum(bucket) / len(bucket), 3),
                        "bucket_max_s": round(max(bucket), 3),
                        "cum_s": round(time.time() - t_start, 1),
                    }
                ),
                flush=True,
            )

    merges = bpe_learn_merges_from_vocab(vocab, n_merges, on_round=on_round)
    print(
        json.dumps(
            {
                "n_merges": len(merges),
                "total_s": round(time.time() - t_start, 1),
                "mean_merge_s": round(sum(rounds) / len(rounds), 3),
                "first_100_mean_s": round(sum(rounds[:100]) / 100, 3),
                "last_100_mean_s": round(sum(rounds[-100:]) / 100, 3),
                "last_merge": merges[-1],
            }
        )
    )


if __name__ == "__main__":
    main()
