"""IVF index: exactness at full probe, recall at partial probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.operators import ivf as IVF


@pytest.fixture(scope="module")
def index(spark, embeddings):
    emb = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    idx = IVF.build_ivf(emb, n_centroids=8, seed=42)
    idx.assigned.cache().count()
    return idx


@pytest.fixture(scope="module")
def query_set(embeddings):
    rows = embeddings.filter(F.col("vec_id") < 4).collect()
    return [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]


def _exact(spark, embeddings, query_set, k):
    from c99_vectordb_spark.operators.recall import score_sq_l2

    emb = embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    out = {}
    for qid, qvec in query_set:
        rows = (
            emb.withColumn("score", F.round(score_sq_l2(F.col("vec"), qvec), 4))
            .filter(F.col("id") != qid)
            .orderBy(F.asc("score"), F.asc("id"))
            .limit(k)
            .collect()
        )
        out[qid] = [(r.id, r.score) for r in rows]
    return out


def test_full_probe_is_exact(spark, embeddings, index, query_set):
    exact = _exact(spark, embeddings, query_set, k=5)
    got = IVF.ivf_search(index, query_set, k=5, nprobe=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.id, r.score))
    assert by_q == exact


def test_partial_probe_recall(spark, embeddings, index, query_set):
    exact = _exact(spark, embeddings, query_set, k=1)
    got = IVF.ivf_search(index, query_set, k=1, nprobe=3).collect()
    hits = sum(
        1
        for r in got
        if exact[r.qid] and r.id == exact[r.qid][0][0]
    )
    # self-vector's own cluster is always probed first; top-1 neighbors
    # of random gaussian vectors usually share it
    assert hits >= len(query_set) // 2


def test_partitioned_index_roundtrip(spark, index, query_set, tmp_path):
    path = str(tmp_path / "ivf")
    index.write(path)
    loaded = IVF.IvfIndex.read(spark, path, index.centroids)
    a = sorted(map(tuple, IVF.ivf_search(index, query_set[:1], k=3, nprobe=2).collect()))
    b = sorted(map(tuple, IVF.ivf_search(loaded, query_set[:1], k=3, nprobe=2).collect()))
    assert a == b


def _query_df(spark, query_set):
    return spark.createDataFrame(
        [(qid, vec) for qid, vec in query_set], "qid LONG, qvec ARRAY<DOUBLE>"
    )


def test_batch_search_equals_loop_search(spark, index, query_set):
    """The single-plan batch path must reproduce the per-query loop
    exactly (same probe ranking, same score rounding, same ties)."""
    loop = sorted(map(tuple, IVF.ivf_search(index, query_set, k=5, nprobe=3).collect()))
    batch = sorted(
        map(
            tuple,
            IVF.ivf_search_batch(
                index, _query_df(spark, query_set), k=5, nprobe=3
            ).collect(),
        )
    )
    assert batch == loop


def test_batch_full_probe_is_exact(spark, embeddings, index, query_set):
    exact = _exact(spark, embeddings, query_set, k=5)
    got = IVF.ivf_search_batch(index, _query_df(spark, query_set), k=5, nprobe=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.id, r.score))
    assert by_q == exact


def test_batch_search_plan_has_no_unions(spark, index, query_set):
    """Plan-size guard: one probe join + one index join, zero Union
    nodes — the plan must not grow with the number of queries."""
    df = IVF.ivf_search_batch(index, _query_df(spark, query_set), k=5, nprobe=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
