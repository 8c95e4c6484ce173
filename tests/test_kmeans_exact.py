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


def _py_kmeans_spec(vecs_q, k, dsub, iters):
    """Pure-Python reference of the kmeans_exact SPEC (independent
    reimplementation for hypothesis triangulation: python==duckdb here,
    spark==duckdb in the fixture tests above). vecs_q: list of
    (id, [int vals]) with len divisible by dsub."""
    from c99_vectordb_spark.operators.kmeans_exact import B1, B2, P1, P2, _powers

    n_spaces = len(vecs_q[0][1]) // dsub
    w1, w2 = _powers(B1, P1, dsub), _powers(B2, P2, dsub)
    cent = {}
    for j in range(n_spaces):
        cands = {}
        for _id, v in vecs_q:
            sub = v[j * dsub : (j + 1) * dsub]
            h1 = sum(x * w for x, w in zip(sub, w1)) % P1
            h2 = sum(x * w for x, w in zip(sub, w2)) % P2
            key = (h1, h2)
            if key in cands:
                cands[key] = [min(a, b) for a, b in zip(cands[key], sub)]
            else:
                cands[key] = list(sub)
        ranked = sorted(cands)
        n = len(ranked)
        for i in range(k):
            rn = ((2 * i + 1) * n) // (2 * k)
            for sd, cv in enumerate(cands[ranked[rn]]):
                cent[(j, i, sd)] = cv

    def assign():
        out = {}
        for _id, v in vecs_q:
            for j in range(n_spaces):
                sub = v[j * dsub : (j + 1) * dsub]
                best = min(
                    (
                        sum(
                            (sub[sd] - cent[(j, i, sd)]) ** 2
                            for sd in range(dsub)
                        ),
                        i,
                    )
                    for i in range(k)
                )
                out[(_id, j)] = best[1]
        return out

    for _ in range(iters):
        codes = assign()
        sums: dict = {}
        for _id, v in vecs_q:
            for j in range(n_spaces):
                i = codes[(_id, j)]
                s, cnt = sums.setdefault(
                    (j, i), ([0] * dsub, 0)
                )
                for sd in range(dsub):
                    s[sd] += v[j * dsub + sd]
                sums[(j, i)] = (s, cnt + 1)
        for (j, i), (s, cnt) in sums.items():
            for sd in range(dsub):
                cent[(j, i, sd)] = (2 * s[sd] + cnt) // (2 * cnt)
    return cent, assign()


def test_hypothesis_python_ref_matches_duckdb(tmp_path):
    """Hypothesis sweep: on random small integer-vector corpora
    (duplicates and degenerate shapes included), the independent
    pure-Python spec reference and the DuckDB CTE trainer produce
    identical centroids and codes. Combined with the Spark==DuckDB
    fixture tests above, this triangulates all three implementations
    of the spec."""
    import duckdb
    from hypothesis import HealthCheck, given, settings, strategies as st

    from c99_vectordb_spark.operators.kmeans_exact import duckdb_kmeans_cte

    dim, dsub, k, iters = 8, 4, 4, 2

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=dim,
                max_size=dim,
            ),
            min_size=1,
            max_size=24,
        )
    )
    def check(vec_rows):
        vecs_q = list(enumerate(vec_rows))
        py_cent, py_codes = _py_kmeans_spec(vecs_q, k, dsub, iters)

        con = duckdb.connect()
        con.execute("CREATE TABLE qvals (id BIGINT, d BIGINT, val BIGINT)")
        con.executemany(
            "INSERT INTO qvals VALUES (?, ?, ?)",
            [
                (i, d, v)
                for i, row in vecs_q
                for d, v in enumerate(row)
            ],
        )
        cte, cfin, ccodes = duckdb_kmeans_cte(
            f"SELECT id, d // {dsub} AS j, d % {dsub} AS sd, val FROM qvals",
            k=k,
            dsub=dsub,
            iters=iters,
        )
        d_cent = {
            (j, i, sd): v
            for j, i, sd, v in con.execute(
                f"WITH {cte} SELECT j, i, sd, cval FROM {cfin}"
            ).fetchall()
        }
        d_codes = {
            (i_, j): c
            for i_, j, c in con.execute(
                f"WITH {cte} SELECT id, j, code FROM {ccodes}"
            ).fetchall()
        }
        assert d_cent == py_cent
        assert d_codes == py_codes

    check()
