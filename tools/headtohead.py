#!/usr/bin/env python
"""Measured head-to-head vs the EXECUTED reference on the same corpus.

Builds one YAML database from the sf0.1 documents table (5,000 records
with metadata), then times the same operations through both engines:

- reference: /root/reference/memo_cli.py run in-process, with faiss
  replaced by an exact brute-force index (tests/test_cli_recall_golden
  fixture) and its PYTHONHASHSEED-salted hash() replaced by the repo's
  stable token hash at its one documented seam. Caveats, both FAVORING
  the reference: the fake index's add() is O(1) where real HNSW
  (efConstruction=200) pays a graph insert per record, so the measured
  reference BUILD time is a lower bound; its search is numpy exhaustive
  where the reference defeats HNSW anyway (k=ntotal forces an exact
  ranked scan of all records, memo_cli.py:291-292), so recall latency
  is like-for-like.
- this engine: the Spark CLI (cli.main) on a warm local session,
  identical argv surface, same YAML database.

Prints one JSON line and writes HEADTOHEAD.md.
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("H2H_DOCS", "5000"))
SF_DIR = os.environ.get("H2H_SF_DIR", "/root/testdata/sf0.1")
REPEAT = 3


def _fake_faiss():
    tests_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    )
    if tests_dir not in sys.path:  # importable name -> picklable classes
        sys.path.insert(0, tests_dir)
    import test_cli_recall_golden as tg

    return tg._fake_faiss()


def load_reference():
    from c99_vectordb_spark.hashing import token_hash

    saved = sys.modules.get("faiss")
    sys.modules["faiss"] = _fake_faiss()
    try:
        spec = importlib.util.spec_from_file_location(
            "memo_cli_h2h", "/root/reference/memo_cli.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["memo_cli_h2h"] = mod
        spec.loader.exec_module(mod)
    finally:
        if saved is not None:
            sys.modules["faiss"] = saved
    mod.hash = token_hash  # stable-hash injection (documented seam)
    return mod


def cap(fn, *a):
    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        rc = fn(*a)
    return time.time() - t0, rc, buf.getvalue()


def best(f, *a, n=REPEAT):
    times = []
    out = None
    for _ in range(n):
        dt, rc, o = cap(f, *a)
        assert rc == 0, o
        times.append(dt)
        out = o
    return min(times), out


def main() -> None:
    import tempfile

    import pandas as pd  # noqa: F401  (spark toPandas path)

    from c99_vectordb_spark import cli
    from c99_vectordb_spark.fmt import LiteralStr
    from c99_vectordb_spark.session import get_spark
    import yaml as _yaml

    spark = get_spark("headtohead")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
        .limit(N_DOCS)
        .collect()
    )

    tmp = tempfile.mkdtemp(prefix="h2h_")
    base = os.path.join(tmp, "db")
    recs = [
        {
            "id": i,
            "metadata": {"lang": r.lang, "source": r.source, "n_chars": int(r.n_chars)},
            "body": LiteralStr(r.text or ""),
        }
        for i, r in enumerate(docs)
    ]
    with open(base + ".yaml", "w", encoding="utf-8") as f:
        f.write(
            _yaml.safe_dump_all(
                recs, explicit_start=True, sort_keys=False, allow_unicode=True
            )
        )

    ref = load_reference()
    d, cwd = os.path.basename(base), os.path.dirname(base)
    results: dict[str, dict[str, float]] = {}

    # --- index/embedding build: reference reindex embeds every record
    t_ref_build, _ = best(ref.command_reindex, d, cwd, False, n=1)
    results["build_index"] = {"reference_sec": round(t_ref_build, 3)}
    # ours: embed the same corpus through the Spark CLI reindex
    t_my_build, _ = best(cli.main, ["-f", base, "reindex"], n=1)
    results["build_index"]["spark_yaml_sec"] = round(t_my_build, 3)

    # native-store twin (what a migrated user runs): records + derived
    # embeddings live in parquet; converted once, NOT timed
    from c99_vectordb_spark import fmt
    from c99_vectordb_spark.functions.embed import build_embeddings
    from c99_vectordb_spark.model import DIM
    from c99_vectordb_spark.operators import analyze as A, filters as Flt, recall as R
    from c99_vectordb_spark.sources import yaml_io

    records_pq = os.path.join(tmp, "records.parquet")
    emb_pq = os.path.join(tmp, "emb.parquet")
    recs_df = yaml_io.load_records_yaml(spark, base + ".yaml")
    recs_df.write.mode("overwrite").parquet(records_pq)
    build_embeddings(recs_df, dim=DIM).write.mode("overwrite").parquet(emb_pq)

    def native_build():
        build_embeddings(
            spark.read.parquet(records_pq), dim=DIM
        ).write.mode("overwrite").parquet(os.path.join(tmp, "emb2.parquet"))
        return 0

    t_nat_build, _ = best(native_build, n=1)
    results["build_index"]["spark_native_sec"] = round(t_nat_build, 3)

    # --- analyze: filtered + stats aggregation
    flt = "lang: en"
    t_ref, ref_out = best(ref.command_analyze, d, flt, None, "source", 100, 0, cwd)
    t_my, my_out = best(cli.main, ["-f", base, "analyze", "--filter", flt, "--stats", "source"])
    assert my_out == ref_out, "analyze outputs diverged"

    def native_analyze():
        import pyspark.sql.functions as SF

        recs = spark.read.parquet(records_pq)
        pred = Flt.compile_filter(
            {"lang": "en"}, Flt.map_resolver(), nonempty=Flt.records_nonempty_metadata()
        )
        matched = recs.filter(pred)
        n = matched.count()
        (
            matched.groupBy(SF.col("metadata")["source"].alias("v"))
            .agg(SF.count(SF.lit(1)).alias("count"), SF.min("id").alias("first_id"))
            .orderBy(SF.desc("count"), SF.asc("first_id"))
            .collect()
        )
        return 0 if n >= 0 else 1

    t_nat, _ = best(native_analyze)
    results["analyze_filter_stats"] = {
        "reference_sec": round(t_ref, 3),
        "spark_yaml_sec": round(t_my, 3),
        "spark_native_sec": round(t_nat, 3),
    }

    # --- recall: top-5 semantic search (exhaustive on both sides; both
    # read their prebuilt index)
    q = "distributed query engine shuffle join"
    t_ref, ref_out = best(ref.command_recall, d, q, 5, None, False, cwd)
    t_my, my_out = best(cli.main, ["-f", base, "recall", "-k", "5", q])
    assert my_out == ref_out, "recall outputs diverged"

    emb_df = spark.read.parquet(emb_pq)

    def native_recall():
        recs = spark.read.parquet(records_pq)
        R.recall(recs, q, k=5, dim=DIM, embeddings=emb_df).collect()
        return 0

    t_nat, _ = best(native_recall)
    results["recall_top5"] = {
        "reference_sec": round(t_ref, 3),
        "spark_yaml_sec": round(t_my, 3),
        "spark_native_sec": round(t_nat, 3),
    }

    spark.stop()

    lines = [
        "# HEADTOHEAD — measured vs the executed reference",
        "",
        f"Same {len(recs)}-record database (sf0.1 documents + metadata),",
        "same in-process invocation, min of 3 (build: 1 run). Reference runs",
        "with an exact fake-faiss index and the stable-hash injection —",
        "see tools/headtohead.py header for why both caveats FAVOR the",
        "reference. CLI outputs are asserted byte-identical before any",
        "timing counts. Three columns: the reference (YAML+pickle, its only",
        "store), this engine through the YAML COMPAT ADAPTER (driver-side",
        "parse, documented shim), and this engine on its NATIVE parquet",
        "store — the path a migrated user runs.",
        "",
        "| operation | reference (s) | spark, yaml adapter (s) | spark, native store (s) | native speedup |",
        "|---|---|---|---|---|",
    ]
    for op, r in results.items():
        sp = r["reference_sec"] / r["spark_native_sec"] if r.get("spark_native_sec") else 0
        lines.append(
            f"| {op} | {r['reference_sec']} | {r['spark_yaml_sec']} |"
            f" {r['spark_native_sec']} | {sp:.2f}x |"
        )
    lines += [
        "",
        "The reference embeds and scores in single-threaded pure Python;",
        "the Spark paths run the same stable-hash spec Arrow-batched across",
        "local[32]. The YAML adapter pays the reference's own driver-side",
        "parse cost PLUS JVM round-trips, so it tracks the reference at",
        "small scale; the native store drops both. At 100 TB the reference",
        "cannot run at all (single process, full in-memory corpus, full",
        "rebuild on every overwrite); the Spark plans partition (SCALE.md).",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "HEADTOHEAD.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"n_docs": N_DOCS, "results": results}))


if __name__ == "__main__":
    main()
