"""MLlib LSH operators: recall vs exact ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.operators import dedup as D, mllib_lsh as ML


def test_brp_similarity_join_finds_close_pairs(spark, embeddings):
    emb = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).limit(200)
    # ground truth: exact pairs under distance threshold
    from c99_vectordb_spark.operators.recall import score_sq_l2

    a = emb.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = emb.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    thresh = 7.0
    exact = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dist",
            F.sqrt(
                F.aggregate(
                    F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
        )
        .filter(F.col("dist") <= thresh)
    )
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    approx = ML.brp_similarity_join(emb, threshold=thresh, num_hash_tables=6)
    approx_pairs = {(r.id_a, r.id_b) for r in approx.collect()}
    # approx result must be a subset of truth... actually approxSimilarityJoin
    # post-filters by true distance, so: no false positives, high recall
    assert approx_pairs <= exact_pairs
    if exact_pairs:
        recall = len(approx_pairs) / len(exact_pairs)
        assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_minhash_similarity_join_near_dups(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy cat tonight"),
        (3, "completely unrelated words about spark catalyst engines"),
    ]
    docs = spark.createDataFrame(rows, ["id", "body"])
    out = {
        (r.id_a, r.id_b): r.jaccard_dist
        for r in ML.minhash_similarity_join(docs, threshold=0.6).collect()
    }
    assert out.get((0, 1)) == 0.0
    assert (0, 3) not in out
    assert (0, 2) in out  # one-token edit => small jaccard distance
