"""Product quantization (PQ) for compressed ANN search (SURVEY §2.11
similarity-search scale path; companion to operators/ivf.py).

The FAISS-style memory trade: split each d-dim vector into ``m``
subvectors, k-means each subspace to ``ksub`` centroids, and store a
vector as m small codes (m bytes at ksub<=256) instead of d floats —
a 32x compression at d=64, m=8, float32. Search scores a query
against codes with ADC (asymmetric distance computation): one tiny
per-query lookup table of query-to-centroid distances per subspace,
then a code is scored by summing m table lookups — no decompression.

Spark shapes:
- train: m small KMeans fits on subvector slices (driver orchestrates
  m fits; each fit is a distributed MLlib job over one slice).
- encode: map-only Arrow UDF (numpy argmin over ksub centroids per
  subspace) — no shuffle, codes stay co-partitioned with ids.
- search: the LUT is a nested array literal (m x ksub doubles, built
  driver-side from the query), the ADC sum is a JVM-side
  zip_with/aggregate over the codes column, and top-k is
  TakeOrderedAndProject — scan + map + per-partition heap, the same
  plan shape as exact KNN but over m-byte codes instead of vectors.

Not DuckDB-oracle-checkable (KMeans is engine-specific); verified by
the ADC==reconstruction identity and recall-vs-exact tests
(tests/test_pq.py), mirroring the IVF strategy.
"""

from __future__ import annotations

import pandas as pd  # top-level: pandas_udf type hints resolve in module globals
from pyspark.sql import Column, DataFrame, functions as F


class PqModel:
    """Driver-side codebooks: m subspaces x ksub centroids x dsub dims
    (m*ksub*dsub doubles — a few KB; broadcast implicitly as literals)."""

    def __init__(self, codebooks: list[list[list[float]]], dim: int):
        self.codebooks = codebooks
        self.m = len(codebooks)
        self.dim = dim
        self.dsub = dim // self.m

    def decode(self, codes: list[int]) -> list[float]:
        """Reconstruct the quantized vector (test/debug helper)."""
        out: list[float] = []
        for j, c in enumerate(codes):
            out.extend(self.codebooks[j][c])
        return out


def pq_train(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "vec",
    seed: int = 42,
    max_iter: int = 20,
) -> PqModel:
    """Fit the m per-subspace codebooks. Each subspace is an
    independent small KMeans over the slice — at 100 TB you fit on a
    sample (pass ``emb.sample(...)``); encoding the full corpus is the
    map-only pass below."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        sl = emb.select(
            array_to_vector(
                F.slice(F.col(vec_col).cast("array<double>"), j * dsub + 1, dsub)
            ).alias("features")
        )
        model = KMeans(k=ksub, seed=seed + j, maxIter=max_iter).fit(sl)
        codebooks.append([list(map(float, c)) for c in model.clusterCenters()])
    return PqModel(codebooks, dim)


def pq_encode(
    emb: DataFrame,
    model: PqModel,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Map-only encoding: (id, codes ARRAY<INT> of length m). Arrow
    batches in, numpy argmin per subspace (||x-c||^2 via the dot-trick,
    vectorized over the whole batch), Arrow batches out."""
    import numpy as np

    cb = [np.asarray(b, dtype=np.float64) for b in model.codebooks]
    dsub, mm = model.dsub, model.m

    dim = dsub * mm

    @F.pandas_udf("array<int>")
    def _enc(vecs: pd.Series) -> pd.Series:
        # NULL / wrong-length vectors encode to NULL instead of letting
        # np.stack raise on a ragged batch and abort the whole job
        # (round-5 review finding)
        vals = [
            None
            if v is None or len(v) != dim
            else np.asarray(v, dtype=np.float64)
            for v in vecs
        ]
        good = [v for v in vals if v is not None]
        out: list[list[int] | None] = [None] * len(vals)
        if good:
            X = np.stack(good)
            codes = np.empty((X.shape[0], mm), dtype=np.int32)
            for j in range(mm):
                S = X[:, j * dsub : (j + 1) * dsub]
                C = cb[j]
                d = (S * S).sum(1)[:, None] - 2.0 * S @ C.T + (C * C).sum(1)[None, :]
                codes[:, j] = d.argmin(1)
            it = iter(codes)
            for i, v in enumerate(vals):
                if v is not None:
                    out[i] = list(map(int, next(it)))
        return pd.Series(out)

    return emb.select(F.col(id_col).alias("id"), _enc(F.col(vec_col)).alias("codes"))


def _lut_literal(model: PqModel, qvec: list[float]) -> Column:
    """The ADC lookup table as a nested array literal: row j holds the
    squared distances of the query's j-th subvector to that subspace's
    ksub centroids."""
    dsub = model.dsub
    rows = []
    for j, book in enumerate(model.codebooks):
        q = qvec[j * dsub : (j + 1) * dsub]
        rows.append(
            F.array(
                *[
                    F.lit(sum((x - y) * (x - y) for x, y in zip(q, c)))
                    for c in book
                ]
            )
        )
    return F.array(*rows)


def pq_adc_topk(
    codes: DataFrame,
    model: PqModel,
    qvec: list[float],
    k: int = 10,
) -> DataFrame:
    """ADC top-k over encoded vectors: score = sum_j LUT[j][code_j],
    evaluated JVM-side (zip_with + aggregate over the codes array),
    then TakeOrderedAndProject on (score, id). Approximation error is
    exactly the quantization error: the score equals the true distance
    of the query to the RECONSTRUCTED vector (identity-tested)."""
    lut = _lut_literal(model, qvec)
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            lut,
            lambda c, row: F.element_at(row, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        codes.select("id", score.alias("score"))
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(k)
    )


def pq_search_refined(
    codes: DataFrame,
    emb: DataFrame,
    model: PqModel,
    qvec: list[float],
    k: int = 10,
    rerank: int | None = None,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """The production PQ pattern: ADC shortlist of ``rerank``
    candidates (default 4k) over the compressed codes, then exact
    re-scoring of only that shortlist against the full vectors —
    recall of near-exact search at the scan cost of the code table.
    The shortlist is tiny, so its join back to the vector table
    broadcasts; the full-vector side is touched only for rerank rows
    (at scale: a row-key lookup, here a broadcast-semi pattern)."""
    rerank = rerank or 4 * k
    shortlist = pq_adc_topk(codes, model, qvec, k=rerank).select(
        F.col("id").alias("_shortlist_id")
    )
    qcol = F.array(*[F.lit(float(v)) for v in qvec])
    exact = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            qcol,
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        emb.join(
            F.broadcast(shortlist),
            F.col(id_col) == F.col("_shortlist_id"),
            "left_semi",
        )
        .select(F.col(id_col).alias("id"), exact.alias("score"))
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(k)
    )
