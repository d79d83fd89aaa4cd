#!/usr/bin/env python
"""Diff two ENTRY_TIMINGS_r{N}.json artifacts — the per-operator analogue
of comparing BENCH files. Prints entries whose Spark wall moved more than
THRESHOLD× between rounds (both directions), plus adds/removes, so an
operator-level regression can't hide inside a green suite total.

Usage:  python tools/timing_drift.py ENTRY_TIMINGS_r12.json ENTRY_TIMINGS_r13.json
        (default threshold 2.0; override with S4PS_DRIFT_THRESHOLD)

Interpretation guardrails: sf0.01 rehearsal timings are fixed-overhead-
dominated for most entries (micro-batch drains, session warmup order), so
a 2× move on a sub-second entry is usually scheduling noise — the signal
is multi-second entries moving, or many entries moving the same way
(host-state drift, which the BENCH DuckDB control corroborates).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    threshold = float(os.environ.get("S4PS_DRIFT_THRESHOLD", "2.0"))
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    if old.get("sf_dir") != new.get("sf_dir"):
        print(
            f"NOTE: different sf_dirs ({old.get('sf_dir')} vs "
            f"{new.get('sf_dir')}) — ratios compare scales, not drift"
        )
    o, n = old["entries"], new["entries"]
    moved = []
    for name in sorted(set(o) & set(n)):
        a, b = o[name]["spark_s"], n[name]["spark_s"]
        if a > 0 and b > 0 and max(a / b, b / a) >= threshold and max(a, b) >= 1.0:
            moved.append((b / a, a, b, name))
    for ratio, a, b, name in sorted(moved, reverse=True):
        print(f"{ratio:6.2f}x  {a:7.2f}s -> {b:7.2f}s  {name}")
    added, removed = sorted(set(n) - set(o)), sorted(set(o) - set(n))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    tot_o = sum(t["spark_s"] for t in o.values())
    tot_n = sum(t["spark_s"] for t in n.values())
    print(
        f"{len(moved)} entries moved >= {threshold}x (of {len(set(o) & set(n))} "
        f"shared); total spark {tot_o:.1f}s -> {tot_n:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
