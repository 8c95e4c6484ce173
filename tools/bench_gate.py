#!/usr/bin/env python
"""Bench regression gate.

Usage:
    python bench.py | python tools/bench_gate.py        # gate stdin
    python tools/bench_gate.py BENCH_rN.json            # gate a file
    python tools/bench_gate.py --update BENCH_rN.json   # also record new bests

Compares per-query timings against the stored per-query bests in
tools/bench_best.json and exits 1 if any headline query regressed more
than REGRESSION_FACTOR (1.3x) — the "correct but slower" failure mode
the test suite can't see. New queries and faster runs update the best
file only with --update (so a one-off slow CI box can't poison it,
and a gate run never silently rewrites history).
"""

from __future__ import annotations

import json
import os
import sys

REGRESSION_FACTOR = 1.3
#: absolute grace on top of the factor — scheduler/noop-sink jitter is
#: ~0.2s regardless of query cost, which would flap sub-second queries
ABS_SLACK_SEC = 0.25
#: ignore sub-300ms queries: noop-sink noise dominates below this
MIN_GATED_SEC = 0.3

BEST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_best.json")


def main(argv: list[str]) -> int:
    update = "--update" in argv
    args = [a for a in argv if a != "--update"]
    if args:
        with open(args[0], encoding="utf-8") as f:
            bench = json.load(f)
    else:
        bench = json.loads(sys.stdin.read().strip().splitlines()[-1])

    best = {}
    if os.path.exists(BEST_PATH):
        with open(BEST_PATH, encoding="utf-8") as f:
            best = json.load(f)

    queries = bench.get("queries", {})
    sf = str(bench.get("sf"))
    best_sf = best.setdefault(sf, {})

    regressions = []
    for name, sec in queries.items():
        prior = best_sf.get(name)
        if (
            prior is not None
            and prior >= MIN_GATED_SEC
            and sec > prior * REGRESSION_FACTOR + ABS_SLACK_SEC
        ):
            regressions.append((name, prior, sec))
        if update and (prior is None or sec < prior):
            best_sf[name] = sec

    if update:
        with open(BEST_PATH, "w", encoding="utf-8") as f:
            json.dump(best, f, indent=1, sort_keys=True)

    if regressions:
        print(f"BENCH REGRESSION (> {REGRESSION_FACTOR}x stored best at sf={sf}):")
        for name, prior, sec in sorted(regressions):
            print(f"  {name}: {sec:.3f}s vs best {prior:.3f}s ({sec / prior:.2f}x)")
        return 1
    print(
        f"bench gate OK: {len(queries)} queries within {REGRESSION_FACTOR}x of best"
        + (" (bests updated)" if update else "")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
