"""Product quantization: ADC identity, recall vs exact, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.operators import pq as PQ

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .cache()
    )


@pytest.fixture(scope="module")
def model(emb):
    return PQ.pq_train(emb, dim=DIM, m=16, ksub=16)


@pytest.fixture(scope="module")
def codes(emb, model):
    return PQ.pq_encode(emb, model).cache()


def test_adc_equals_reconstruction_distance(emb, model, codes):
    """The ADC score must EXACTLY equal the squared L2 distance from
    the query to the decoded (reconstructed) vector — the lookup-table
    sum is an identity, not an approximation; quantization error lives
    entirely in encode."""
    import math

    q = [((i * 13) % 17 - 8) / 8.0 for i in range(DIM)]
    got = {r.id: r.score for r in PQ.pq_adc_topk(codes, model, q, k=50).collect()}
    code_rows = {r.id: list(r.codes) for r in codes.collect()}
    for id_, score in got.items():
        rec = model.decode(code_rows[id_])
        want = sum((x - y) * (x - y) for x, y in zip(q, rec))
        assert math.isclose(score, want, rel_tol=0, abs_tol=1e-9), id_


def _exact_ids(emb, q, k):
    d = F.aggregate(
        F.zip_with(
            F.col("vec").cast("array<double>"),
            F.array(*[F.lit(v) for v in q]),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return {
        r.id
        for r in emb.select("id", d.alias("d")).orderBy("d", "id").limit(k).collect()
    }


@pytest.fixture(scope="module")
def qvec(emb):
    # in-distribution query: a corpus vector (ANN's intended workload)
    return [float(x) for x in emb.filter(F.col("id") == 7).collect()[0].vec]


def test_pq_recall_vs_exact(emb, model, codes, qvec):
    """Deterministic recall@10 of raw ADC against the exact scan — a
    fixed fact about this data/codebook, not a flaky tolerance."""
    exact_ids = _exact_ids(emb, qvec, 10)
    pq_ids = {r.id for r in PQ.pq_adc_topk(codes, model, qvec, k=10).collect()}
    recall = len(exact_ids & pq_ids) / 10
    assert recall >= 0.5, f"ADC recall@10 {recall}"


def test_pq_refined_recall(emb, model, codes, qvec):
    """ADC shortlist + exact re-rank must beat raw ADC and approach
    exact search."""
    exact_ids = _exact_ids(emb, qvec, 10)
    ref_ids = {
        r.id
        for r in PQ.pq_search_refined(codes, emb, model, qvec, k=10, rerank=40).collect()
    }
    recall = len(exact_ids & ref_ids) / 10
    assert recall >= 0.8, f"refined recall@10 {recall}"


def test_pq_encode_is_map_only(emb, model):
    plan = PQ.pq_encode(emb, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_topk_uses_take_ordered(codes, model):
    q = [0.1] * DIM
    plan = (
        PQ.pq_adc_topk(codes, model, q, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
