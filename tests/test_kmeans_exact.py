"""operators/kmeans_exact.py: the deterministic integer Lloyd's that
lets sim_pq/sim_ivf be hash-oracled (judge r10 ask #6). Cross-engine
parity on a degenerate fixture (duplicates, fewer candidates than k)
plus the algebraic identities the spec relies on."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_emb(path, vecs):
    tab = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(tab, path)


def _duck_train(path, k, dsub, iters):
    from c99_vectordb_spark.operators.kmeans_exact import (
        duckdb_kmeans_cte,
        duckdb_space_dims,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
    )
    cte, cfin, ccodes = duckdb_kmeans_cte(
        duckdb_space_dims(dsub), k=k, dsub=dsub, iters=iters
    )
    cent = {
        (j, i, sd): v
        for j, i, sd, v in con.execute(
            f"WITH {cte} SELECT j, i, sd, cval FROM {cfin}"
        ).fetchall()
    }
    codes = {
        (i_, j): c
        for i_, j, c in con.execute(
            f"WITH {cte} SELECT id, j, code FROM {ccodes}"
        ).fetchall()
    }
    return cent, codes


def _spark_train(spark, path, k, dsub, iters):
    from c99_vectordb_spark.operators.kmeans_exact import (
        kmeans_exact,
        quantized_dims,
        space_dims,
    )

    emb = spark.read.parquet(str(path))
    cent, codes = kmeans_exact(
        space_dims(quantized_dims(emb), dsub), k=k, dsub=dsub, iters=iters
    )
    return cent, {
        (int(r["id"]), int(r["j"])): int(r["code"]) for r in codes.collect()
    }


def test_degenerate_fixture_parity(spark, tmp_path):
    """Fewer distinct vectors than k (duplicate centroids from the
    quantile init) + exact duplicate vectors + a constant vector: the
    spec must resolve every degenerate rule (duplicated init, empty
    clusters keeping previous centroids, first-index ties) IDENTICALLY
    in both engines."""
    rng = np.random.RandomState(7)
    base = rng.uniform(-1, 1, size=(5, 16))
    vecs = [base[i % 5] for i in range(12)]  # heavy duplication
    vecs.append(np.zeros(16))  # constant vector
    path = tmp_path / "emb.parquet"
    _write_emb(str(path), vecs)

    s_cent, s_codes = _spark_train(spark, path, k=8, dsub=4, iters=3)
    d_cent, d_codes = _duck_train(str(path), k=8, dsub=4, iters=3)
    assert s_cent == d_cent
    assert s_codes == d_codes
    # duplicate vectors must land in the same cell
    for j in range(4):
        assert s_codes[(0, j)] == s_codes[(5, j)] == s_codes[(10, j)]


def test_spread_fixture_parity(spark, tmp_path):
    """A non-degenerate fixture (64-dim, k=16 over 8-dim subspaces,
    4 rounds — the sim_pq configuration) trains bit-identically."""
    rng = np.random.RandomState(11)
    vecs = rng.uniform(-1, 1, size=(60, 64))
    path = tmp_path / "emb.parquet"
    _write_emb(str(path), vecs)

    s_cent, s_codes = _spark_train(spark, path, k=16, dsub=8, iters=4)
    d_cent, d_codes = _duck_train(str(path), k=16, dsub=8, iters=4)
    assert s_cent == d_cent
    assert s_codes == d_codes
    assert len(s_cent) == 8 * 16 * 8
    assert len(s_codes) == 60 * 8


def test_weighted_sum_hash_equals_left_fold():
    """The init hash is SUM(val * base^(n-1-d)) mod p — order-free, so
    both engines agree — and must equal the sequential left fold
    h = h*base + val it stands in for."""
    from c99_vectordb_spark.operators.kmeans_exact import B1, P1, _powers

    vals = [201, 7, 0, 255, 93, 18, 44, 130]
    w = _powers(B1, P1, len(vals))
    acc = 0
    for v in vals:
        acc = (acc * B1 + v) % P1
    assert sum(v * wi for v, wi in zip(vals, w)) % P1 == acc


def test_quantization_matches_kcenter_convention(spark):
    """quantized_dims must reproduce the repo's established integer
    code (kcenter/test_wave11 convention) exactly."""
    import math

    from c99_vectordb_spark.operators.kmeans_exact import quantized_dims

    xs = [-1.0, -0.99, 0.0, 0.5, 0.77, 1.0]
    emb = spark.createDataFrame(
        [(0, [float(x) for x in xs])], "vec_id long, embedding array<float>"
    )
    got = {
        int(r["d"]): int(r["val"])
        for r in quantized_dims(emb).collect()
    }
    for d, x in enumerate(xs):
        f32 = np.float32(x)
        assert got[d] == math.floor((float(f32) + 1.0) * 127.5 + 0.5)
