#!/usr/bin/env python
"""Diff two ENTRY_TIMINGS_r{N}.json artifacts — the per-operator analogue
of comparing BENCH files. Prints entries whose Spark wall moved more than
THRESHOLD× between rounds (both directions), plus adds/removes, so an
operator-level regression can't hide inside a green suite total.

Usage:  python tools/timing_drift.py ENTRY_TIMINGS_r12.json ENTRY_TIMINGS_r13.json
        (default threshold 2.0; override with S4PS_DRIFT_THRESHOLD)

GATE mode (round-13, the r12 verdict's item 7):
        python tools/timing_drift.py --gate OLD.json NEW.json
exits 1 when any shared entry REGRESSED (new slower) by more than the
gate threshold (default 3.0, S4PS_DRIFT_GATE_THRESHOLD) AND takes >= 1 s
— the operator-level version of the bench 2×-of-baseline band, run as
part of the closing ritual so a per-entry wall regression can't ship
inside a green suite. Entries named in S4PS_DRIFT_GATE_ALLOW (comma-
separated) are reported but don't fail the gate — each allowance must
be explained in BASELINE.md.

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
    args = [a for a in sys.argv[1:] if a != "--gate"]
    gate = "--gate" in sys.argv[1:]
    if len(args) != 2:
        print(__doc__)
        return 2
    threshold = float(os.environ.get("S4PS_DRIFT_THRESHOLD", "2.0"))
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
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
    if gate:
        gate_t = float(os.environ.get("S4PS_DRIFT_GATE_THRESHOLD", "3.0"))
        allow = {
            a.strip()
            for a in os.environ.get("S4PS_DRIFT_GATE_ALLOW", "").split(",")
            if a.strip()
        }
        regressed = [
            (n[name]["spark_s"] / o[name]["spark_s"], name)
            for name in set(o) & set(n)
            if o[name]["spark_s"] > 0
            and n[name]["spark_s"] >= 1.0
            and n[name]["spark_s"] / o[name]["spark_s"] >= gate_t
        ]
        hard = [(r, name) for r, name in regressed if name not in allow]
        for r, name in sorted(regressed, reverse=True):
            mark = "ALLOWED" if name in allow else "GATE-FAIL"
            print(f"{mark}: {name} regressed {r:.2f}x (>= {gate_t}x)")
        if hard:
            print(
                f"GATE: {len(hard)} entry regressions >= {gate_t}x — "
                "explain in BASELINE.md or fix before close"
            )
            return 1
        print(f"GATE: no unallowed entry regression >= {gate_t}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
