#!/usr/bin/env python
"""Render a BENCH json against the BASELINE table with diagnostics.

Usage:
    python tools/bench_compare.py BENCH_r04.json [--gate 2.0]

For every benched query: median seconds, baseline seconds, ratio, and the
run's own contention telemetry (load before, busy-cpu and steal seconds
across the 3 timed runs). Exit code 1 if any ratio exceeds the gate AND
its steal telemetry does not indicate host contention (steal > 5 s across
the timed runs) — i.e. a breach that is OURS to explain.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BASELINE_SEC  # noqa: E402

#: contention rule: steal above max(2 s, 5% of the window's busy-cpu time)
#: marks a breach HOST-CONTENDED. Absolute floor for heavy queries, relative
#: term for sub-second ones (2.5 s of steal in a 3-run window of a 0.4 s
#: query IS the distortion; the same 2.5 s under 300 busy-cpu-s is not).
STEAL_FLOOR_S = 2.0
STEAL_BUSY_FRAC = 0.05


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("--gate", type=float, default=2.0)
    args = ap.parse_args()
    with open(args.bench_json) as f:
        d = json.load(f)
    tele = d.get("telemetry", {})
    rows, unexplained = [], []
    for name, sec in d["queries"].items():
        base = BASELINE_SEC.get(name)
        t = tele.get(name, {})
        ratio = round(sec / base, 2) if base else None
        steal = t.get("steal_s")
        flag = ""
        if ratio and ratio > args.gate:
            busy = t.get("busy_cpu_s") or 0.0
            bar = max(STEAL_FLOOR_S, STEAL_BUSY_FRAC * busy)
            contended = steal is not None and steal > bar
            flag = "HOST-CONTENDED" if contended else "BREACH"
            if not contended:
                unexplained.append(name)
        rows.append((name, sec, base, ratio, t.get("load1_before"), t.get("busy_cpu_s"), steal, flag))
    w = max(len(r[0]) for r in rows)
    print(f"{'query':{w}}  {'sec':>8}  {'base':>6}  {'ratio':>5}  {'load1':>5}  {'busy_s':>7}  {'steal_s':>7}")
    for name, sec, base, ratio, load1, busy, steal, flag in rows:
        print(
            f"{name:{w}}  {sec:>8}  {base if base is not None else '-':>6}  "
            f"{ratio if ratio is not None else '-':>5}  "
            f"{load1 if load1 is not None else '-':>5}  "
            f"{busy if busy is not None else '-':>7}  "
            f"{steal if steal is not None else '-':>7}  {flag}"
        )
    total_base = sum(b for b in (BASELINE_SEC.get(n) for n in d["queries"]) if b)
    total = sum(s for n, s in d["queries"].items() if BASELINE_SEC.get(n))
    print(f"\naggregate over baselined rows: {total:.1f}s vs {total_base:.1f}s = {total / total_base:.2f}x")
    if unexplained:
        print(f"UNEXPLAINED >{args.gate}x: {', '.join(unexplained)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
