"""V2-V4 recall semantics: ranking, clamping, filters, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark import hashing
from c99_vectordb_spark.operators import recall as R

DIM = 64


def test_clamp_k():
    assert R.clamp_k(None) == 2
    assert R.clamp_k(0) == 1
    assert R.clamp_k(-5) == 1
    assert R.clamp_k(7) == 7
    assert R.clamp_k(1000) == 100


def test_exact_token_match_ranks_first(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha beta delta"),
            (2, "totally unrelated words here"),
            (3, "   "),
        ],
        ["id", "body"],
    )
    out = R.recall(df, "alpha beta gamma", k=3, dim=DIM).collect()
    assert [r.id for r in out] == [0, 1, 2]
    assert out[0].score == pytest.approx(0.0, abs=1e-9)
    # exact parity with the python spec (incl. any bucket collisions)
    q = hashing.embed_text("alpha beta gamma", dim=DIM)
    d2 = hashing.embed_text("totally unrelated words here", dim=DIM)
    expected = sum((a - b) ** 2 for a, b in zip(q, d2))
    assert out[2].score == pytest.approx(expected, abs=1e-9)


def test_recall_with_prefilter(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha beta"), (2, "alpha beta")], ["id", "body"]
    )
    out = R.recall(df, "alpha", k=3, filter_col=F.col("id") != 1, dim=DIM).collect()
    assert [r.id for r in out] == [0, 2]


def test_knn_integer_metric(spark, embeddings):
    # use the first embedding row as the query against the driver table
    first = embeddings.orderBy("vec_id").first()
    out = R.knn(
        embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        [float(x) for x in first.embedding],
        k=5,
    ).collect()
    assert out[0].id == first.vec_id
    assert out[0].score == pytest.approx(0.0, abs=1e-6)
    scores = [r.score for r in out]
    assert scores == sorted(scores)


def test_recall_ranking_invariant_under_permutation(spark):
    rows = [(i, f"token{i} shared common") for i in range(10)]
    df1 = spark.createDataFrame(rows, ["id", "body"])
    df2 = spark.createDataFrame(list(reversed(rows)), ["id", "body"])
    r1 = [(r.id, round(r.score, 9)) for r in R.recall(df1, "token3 shared", k=5, dim=DIM).collect()]
    r2 = [(r.id, round(r.score, 9)) for r in R.recall(df2, "token3 shared", k=5, dim=DIM).collect()]
    assert r1 == r2
    assert r1[0][0] == 3


def test_embed_query_driver_side():
    q = hashing.embed_text("alpha beta", dim=DIM)
    assert abs(sum(x * x for x in q) - 1.0) < 1e-9


def test_recall_with_prebuilt_embeddings_matches_inflight(spark, tmp_path):
    """The 'index' story: recall against a persisted embeddings table
    (store round-trip) returns exactly what in-flight embedding does."""
    from c99_vectordb_spark.functions.embed import build_embeddings
    from c99_vectordb_spark.sources.store import ParquetStore

    df = spark.createDataFrame(
        [(i, f"token{i} shared common words") for i in range(20)], ["id", "body"]
    )
    store = ParquetStore(spark, str(tmp_path / "db"))
    store.save_embeddings(build_embeddings(df, dim=DIM))
    inflight = R.recall(df, "token7 shared", k=5, dim=DIM).collect()
    indexed = R.recall(
        df, "token7 shared", k=5, dim=DIM, embeddings=store.load_embeddings()
    ).collect()
    assert [(r.id, round(r.score, 9)) for r in inflight] == [
        (r.id, round(r.score, 9)) for r in indexed
    ]
    assert inflight[0].id == 7
