#!/usr/bin/env python
"""Compute the never-driver-checked rotation pool from ground truth.

The DRIVER_WINDOW rotation comments used to hand-maintain the pool list,
which drifted (judge ADVICE r7 #4: 'pool 117 - 36 = 81' vs '80' in the
closeout notes). This tool recomputes it every time from:

    pool = oracled registry names
         - every key in any CORRECTNESS_r*.json (driver-checked ever)
         - the current DRIVER_WINDOW (scheduled this round)

Rows-only queries (no oracle_sql entry) cannot occupy hash slots and are
reported separately.

Usage:
    python tools/rotation_pool.py            # pool AFTER the current window runs
    python tools/rotation_pool.py --raw      # pool ignoring the current window
    python tools/rotation_pool.py --next N   # print the first N alphabetically
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def compute() -> dict[str, list[str]]:
    from c99_vectordb_spark.queries_registry import DRIVER_WINDOW, oracle_sql, queries

    q = set(queries())
    o = set(oracle_sql())
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            checked.update(json.load(fh).keys())
    oracled = q & o
    rows_only = sorted(q - o)
    raw_pool = sorted(oracled - checked)
    pool_after = sorted(oracled - checked - set(DRIVER_WINDOW))
    return {
        "oracled": sorted(oracled),
        "rows_only": rows_only,
        "checked": sorted(checked & q),
        "raw_pool": raw_pool,
        "pool_after_window": pool_after,
        "window": list(DRIVER_WINDOW),
    }


def main() -> None:
    info = compute()
    if "--next" in sys.argv:
        n = int(sys.argv[sys.argv.index("--next") + 1])
        key = "raw_pool" if "--raw" in sys.argv else "pool_after_window"
        for name in info[key][:n]:
            print(name)
        return
    key = "raw_pool" if "--raw" in sys.argv else "pool_after_window"
    names = info[key]
    print(f"registry: {len(info['oracled'])} oracled + {len(info['rows_only'])} rows-only")
    print(f"driver-checked ever: {len(info['checked'])}")
    print(f"window size: {len(info['window'])}")
    print(f"{key}: {len(names)}")
    for name in names:
        print(f"  {name}")
    if info["rows_only"]:
        print("rows-only (excluded from hash slots):")
        for name in info["rows_only"]:
            print(f"  {name}")


if __name__ == "__main__":
    main()
