#!/usr/bin/env python
"""sf1 scale soak (round-6 verdict item #5): run every registry query
once at 10x the bench scale factor and record per-query wall time +
errors to tools/soak_sf1.json.

The 3-scale hash verification (sf0.001/0.01/0.1) proves
correctness-vs-scale; this proves the PLANS — iterative-join loops,
candidate-pair joins over dense duplicate clusters, range-stitch
operators whose partition-prefix collects grow with partition count.
A cliff shows up as an error row or an outlier time, both recorded.

Usage: python tools/scale_soak.py [name ...]   (default: all queries)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SOAK_SF_DIR", os.path.join(REPO, "testdata_sf1"))
OUT = os.path.join(REPO, "tools", "soak_sf1.json")


def main(names: list[str]) -> int:
    from c99_vectordb_spark import queries_registry as QR
    from c99_vectordb_spark.session import get_spark

    spark = get_spark("scale_soak")
    qs = QR.queries()
    if names:
        qs = {n: qs[n] for n in names}
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    # MERGE with any prior checkpoint (resume-after-kill / subset
    # re-runs must not clobber the full record); new runs of the same
    # name overwrite their old row
    results: dict[str, dict] = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                results = json.load(f).get("queries", {})
        except ValueError:
            results = {}
    if os.environ.get("SOAK_SKIP_DONE") == "1":
        qs = {n: f for n, f in qs.items() if n not in results}
    done = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            results[name] = {"sec": round(time.time() - t0, 2)}
        except Exception as exc:  # noqa: BLE001 — the cliff IS the result
            results[name] = {
                "sec": round(time.time() - t0, 2),
                "err": f"{type(exc).__name__}: {exc}"[:300],
            }
        done += 1
        print(
            f"[{done}/{len(qs)}] {name}: {results[name]}",
            file=sys.stderr,
            flush=True,
        )
        # incremental checkpoint so a crash keeps partial results
        with open(OUT, "w") as f:
            json.dump(
                {"sf_dir": SF_DIR, "queries": results}, f, indent=0,
                sort_keys=True,
            )
    errs = {n: r for n, r in results.items() if "err" in r}
    total = sum(r["sec"] for r in results.values())
    print(
        json.dumps(
            {
                "metric": "soak_sf1_total",
                "value": round(total, 1),
                "unit": "sec",
                "n": len(results),
                "errors": len(errs),
            }
        )
    )
    spark.stop()
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
