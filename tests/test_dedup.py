"""Dedup operator semantics on controlled corpora (the oracle queries
check cross-engine parity; these check the *meaning*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.operators import dedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "The  quick   brown fox jumps over the lazy dog"),  # ws/case dup of 0
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup (1 token)
        (4, "completely different text about database engines"),
        (5, "spark catalyst optimizer rewrites logical plans"),
    ]
    return spark.createDataFrame(rows, ["id", "body"])


def test_exact_dedup_keeps_min_id(spark, corpus):
    out = {r.id: r for r in D.exact_dedup(corpus).collect()}
    assert 0 in out and out[0].dup_cnt == 3  # 0, 1, 2 collapse
    assert 1 not in out and 2 not in out
    assert {3, 4, 5} <= set(out)


def test_jaccard_finds_near_dups(spark, corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    # exact dups: jaccard 1.0
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == 1.0
    # 1-token-edit neighbor: high but < 1
    assert 0.5 <= pairs[(0, 3)] < 1.0
    # unrelated docs absent
    assert (0, 4) not in pairs and (4, 5) not in pairs


def test_minhash_lsh_candidates_superset_of_high_jaccard(spark, corpus):
    cands = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(corpus).collect()}
    # identical shingle sets always collide on every band
    assert (0, 1) in cands and (0, 2) in cands


def test_simhash_identical_docs_same_signature(spark, corpus):
    sigs = {r.id: r.sim for r in D.simhash(corpus).collect()}
    assert sigs[0] == sigs[1] == sigs[2]
    assert sigs[0] != sigs[4]
    assert all(0 <= s < (1 << D.SIMHASH_BITS) for s in sigs.values())


def test_simhash_near_pairs_hamming(spark, corpus):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_near_pairs(corpus, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] == 0


def test_cosine_top_pairs_orders_desc(spark, embeddings):
    emb = embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    out = D.cosine_top_pairs(emb, k=10).collect()
    assert len(out) == 10
    scores = [r.cos for r in out]
    assert scores == sorted(scores, reverse=True)
