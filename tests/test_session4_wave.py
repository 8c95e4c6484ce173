"""Property tests for the round-6 session-4 operator wave.

Oracle parity (tools/verify_oracle) proves Spark==DuckDB; these tests
prove the SEMANTICS are right on axes a twin implementation bug could
share — monotonicity laws, exclusion rules, verdict/evidence
consistency — plus a pure-Python recount for the KN statistics.
"""
from __future__ import annotations

import collections

from c99_vectordb_spark.queries_ext import q_anonymize_orders
from c99_vectordb_spark.queries_pipeline import (
    _DSIR_TARGET_SOURCE,
    _DSIR_TOP_K,
    _SEMD_THRESHOLD,
    q_corpus_dsir_weights,
    q_corpus_kn_counts,
    q_corpus_vocab_sweep,
    q_dedup_semantic,
)


def test_kn_counts_match_python_recount(spark, sf_dir):
    rows = {r["token"]: r for r in q_corpus_kn_counts(spark, sf_dir).collect()}
    import duckdb

    toks_per_doc = [
        t[0]
        for t in duckdb.sql(
            "SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    big = collections.Counter()
    uni = collections.Counter()
    for ts in toks_per_doc:
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    left = collections.Counter(w2 for (_w1, w2) in big)
    right = collections.Counter(w1 for (w1, _w2) in big)
    big_tot = collections.Counter()
    for (_w1, w2), c in big.items():
        big_tot[w2] += c
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    assert rows  # top-30 is non-empty at sf0.001
    for tok, r in rows.items():
        assert r["cont_left"] == left[tok]
        assert r["cont_right"] == right[tok]
        assert r["big_total"] == big_tot[tok]
        assert r["uni"] == uni[tok]
        assert r["n1"] == n1 and r["n2"] == n2
        # continuation laws: distinct contexts can't exceed totals
        assert r["cont_left"] <= r["big_total"]
        assert r["big_total"] <= r["uni"]  # every bigram ending needs a token


def test_dsir_excludes_target_and_orders_by_score(spark, sf_dir):
    rows = q_corpus_dsir_weights(spark, sf_dir).collect()
    assert 0 < len(rows) <= _DSIR_TOP_K
    assert all(r["source"] != _DSIR_TARGET_SOURCE for r in rows)
    scores = [(r["dsir_score"], -r["id"]) for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["n_bigrams"] > 0 for r in rows)


def test_dedup_semantic_verdict_evidence_consistency(spark, sf_dir):
    rows = q_dedup_semantic(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0 and len({r["vec_id"] for r in rows}) == n  # one verdict/vec
    by_id = {r["vec_id"]: r for r in rows}
    for r in rows:
        if r["removed"]:
            # the dominator exists, is smaller, shares the cluster, and
            # the evidence cosine clears the threshold
            assert r["dup_of"] >= 0 and r["dup_of"] < r["vec_id"]
            assert by_id[r["dup_of"]]["cluster"] == r["cluster"]
            assert r["max_cos"] >= _SEMD_THRESHOLD
        else:
            assert r["dup_of"] == -1
            assert r["max_cos"] < _SEMD_THRESHOLD or r["n_prior"] == 0
        if r["n_prior"] == 0:
            assert r["max_cos"] == -2.0
    # the smallest id of every cluster can never be removed
    mins = {}
    for r in rows:
        c = r["cluster"]
        if c not in mins or r["vec_id"] < mins[c]["vec_id"]:
            mins[c] = r
    assert all(not r["removed"] for r in mins.values())


def test_vocab_sweep_monotone_in_merges(spark, sf_dir):
    rows = sorted(
        q_corpus_vocab_sweep(spark, sf_dir).collect(),
        key=lambda r: r["n_merges"],
    )
    assert [r["n_merges"] for r in rows] == [2, 4, 8]
    # every merge can only shrink the encoded corpus
    toks = [r["total_bpe_tokens"] for r in rows]
    assert toks == sorted(toks, reverse=True)
    # char symbols upper-bound any encode; words lower-bound it
    for r in rows:
        assert r["total_words"] <= r["total_bpe_tokens"] <= r["total_char_symbols"]
        assert r["vocab_size"] == rows[0]["vocab_size"] - 2 + r["n_merges"]
        assert r["fertility_ppm"] >= 1000000


def test_anonymize_release_rule(spark, sf_dir):
    rows = q_anonymize_orders(spark, sf_dir).collect()
    assert rows
    total = 0
    for r in rows:
        assert r["n_bands"] <= r["n"]
        assert r["released"] == (r["n"] >= 10 and r["n_bands"] >= 3)
        total += r["n"]
    orders_n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert total == orders_n  # groups partition the table


def test_stream_dsir_score_matches_batch(spark, sf_dir):
    """availableNow replay of the candidate docs through
    stream_dsir_score == batch dsir_score with the same standing
    weight table (scores depend only on the weights, so the split into
    micro-batches cannot change them)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from c99_vectordb_spark.operators.corpus import (
        dsir_bucket_weights,
        dsir_features,
        dsir_score,
    )
    from c99_vectordb_spark.queries_pipeline import (
        _DSIR_BUCKETS,
        _DSIR_TARGET_SOURCE,
    )
    from c99_vectordb_spark.streaming.ingest import stream_dsir_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feat_all = dsir_features(docs, "doc_id", "text", _DSIR_BUCKETS)
    weights = dsir_bucket_weights(
        feat_all, _DSIR_TARGET_SOURCE, _DSIR_BUCKETS
    ).persist()
    try:
        cand = docs.filter(F.col("source") != _DSIR_TARGET_SOURCE)
        want = sorted(
            map(
                tuple,
                dsir_score(
                    feat_all.filter(F.col("source") != _DSIR_TARGET_SOURCE),
                    weights,
                ).collect(),
            )
        )
        with tempfile.TemporaryDirectory() as tmp:
            src = os.path.join(tmp, "src")
            # two files -> maxFilesPerTrigger=1 replays as two batches
            cand.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            cand.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            got: list[tuple] = []

            def sink(df, batch_id):
                got.extend(map(tuple, df.collect()))

            q = stream_dsir_score(
                spark.readStream.schema(cand.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src),
                weights,
                sink,
                os.path.join(tmp, "ckpt"),
            ).start()
            q.awaitTermination(120)
        assert sorted(got) == want
        assert len(want) > 0
    finally:
        weights.unpersist()
