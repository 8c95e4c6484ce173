"""Registry of driver-checked queries and their DuckDB oracle twins.

Every entry demonstrates one operator (or a tight operator cluster)
from SURVEY.md §2 / §2.11. Conventions:

- each Spark callable takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in Spark and SQL (the
  driver sorts columns by name before value-hashing);
- hash-derived operators use the stable cross-engine hash spec
  (hashing.py) so results are *exact-integer* comparable;
- floating-point outputs are rounded to a fixed scale on BOTH sides;
- every ordering has a deterministic total tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import hashing
from .model import DIM

# ---------------------------------------------------------------------------
# shared fixtures (deterministic literals used by both engines)
# ---------------------------------------------------------------------------

RECALL_QUERY_TEXT = "spark join merge fast table scan"

#: deterministic 64-d query vector for the embeddings-table KNN
KNN_QUERY_64 = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]


def _duck_doc_vec_cte(dim: int) -> str:
    """DuckDB CTEs computing the signed-BoW integer vector (sparse form)
    of every document: (doc_id, bucket, w)."""
    return f"""
tok AS (
  SELECT doc_id, unnest({hashing.duckdb_tokens_sql('text')}) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, {hashing.duckdb_token_hash_sql('tok')} AS h
  FROM tok
),
vec AS (
  SELECT doc_id, (h % {dim})::BIGINT AS bucket,
         SUM(CASE WHEN h % 2 = 1 THEN 1 ELSE -1 END)::BIGINT AS w
  FROM th
  GROUP BY 1, 2
)"""


# ---------------------------------------------------------------------------
# V2/V3 — recall over documents, exact integer squared-L2 (SURVEY §2.4)
# ---------------------------------------------------------------------------

def q_recall_topk_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive KNN over documents for a fixed query string; exact
    integer squared L2 between unnormalized signed-BoW vectors.

    Spark plan: parquet scan -> map-only pandas-UDF embed -> HOF score
    -> TakeOrderedAndProject (top-k heaps per partition; no shuffle of
    the full table — the 100 TB-safe shape).
    """
    from .functions.embed import embed_pandas_udf
    from .operators.recall import score_sq_l2_int

    q = hashing.embed_text_int(RECALL_QUERY_TEXT, DIM)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(F.col("doc_id").alias("id"), "text")
        .withColumn("vec", embed_pandas_udf(DIM)(F.col("text")))
        .select("id", score_sq_l2_int(F.col("vec"), q).alias("score"))
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(10)
    )


def _oracle_recall_topk_int() -> str:
    qvec = hashing.embed_text_int(RECALL_QUERY_TEXT, DIM)
    q2 = sum(w * w for w in qvec)
    nonzero = [(b, w) for b, w in enumerate(qvec) if w]
    qrows = ", ".join(f"({b}, {w})" for b, w in nonzero)
    # |d - q|^2 = |d|^2 + |q|^2 - 2 d.q   (all integer-exact)
    return f"""
WITH {_duck_doc_vec_cte(DIM)},
norms AS (
  SELECT doc_id, SUM(w * w)::BIGINT AS d2 FROM vec GROUP BY 1
),
qv(bucket, w) AS (VALUES {qrows}),
dots AS (
  SELECT v.doc_id, SUM(v.w * qv.w)::BIGINT AS dot
  FROM vec v JOIN qv ON v.bucket = qv.bucket
  GROUP BY 1
)
SELECT d.doc_id AS id,
       (COALESCE(n.d2, 0) + {q2} - 2 * COALESCE(t.dot, 0))::BIGINT AS score
FROM documents d
LEFT JOIN norms n ON d.doc_id = n.doc_id
LEFT JOIN dots t ON d.doc_id = t.doc_id
ORDER BY score ASC, id ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# V5 — embedding/index build over every document (SURVEY §2.4)
# ---------------------------------------------------------------------------

def q_embed_build_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch embedding build; per-doc integer invariants of the vector
    (nnz + squared norm) checked exactly against the oracle."""
    from .functions.embed import embed_pandas_udf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(F.col("doc_id").alias("id"), "text")
        .withColumn("vec", embed_pandas_udf(DIM)(F.col("text")))
        .select(
            "id",
            F.size(F.filter("vec", lambda x: x != 0)).cast("long").alias("nnz"),
            F.aggregate("vec", F.lit(0).cast("long"), lambda a, x: a + x * x).alias(
                "norm2"
            ),
        )
    )


def _oracle_embed_build_norms() -> str:
    return f"""
WITH {_duck_doc_vec_cte(DIM)},
norms AS (
  SELECT doc_id,
         COUNT(*) FILTER (WHERE w != 0)::BIGINT AS nnz,
         SUM(w * w)::BIGINT AS norm2
  FROM vec GROUP BY 1
)
SELECT d.doc_id AS id,
       COALESCE(n.nnz, 0)::BIGINT AS nnz,
       COALESCE(n.norm2, 0)::BIGINT AS norm2
FROM documents d LEFT JOIN norms n ON d.doc_id = n.doc_id
"""


# ---------------------------------------------------------------------------
# V2 — brute-force KNN over the driver's float embeddings table
# ---------------------------------------------------------------------------

def q_knn_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest neighbors (squared L2) to a fixed literal query
    vector over embeddings.parquet; score rounded to 4 decimals."""
    from .operators.recall import score_sq_l2

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .select("id", F.round(score_sq_l2(F.col("vec"), KNN_QUERY_64), 4).alias("score"))
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(10)
    )


def _oracle_knn_embeddings() -> str:
    qlit = "[" + ", ".join(f"{x!r}::DOUBLE" for x in KNN_QUERY_64) + "]"
    return f"""
SELECT vec_id AS id,
       ROUND(list_sum(list_transform(
           list_zip(embedding, {qlit}),
           p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2]))), 4) AS score
FROM embeddings
ORDER BY score ASC, id ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "recall_topk_int": q_recall_topk_int,
    "embed_build_norms": q_embed_build_norms,
    "knn_embeddings": q_knn_embeddings,
}

_ORACLES: dict[str, str] = {
    "recall_topk_int": _oracle_recall_topk_int(),
    "embed_build_norms": _oracle_embed_build_norms(),
    "knn_embeddings": _oracle_knn_embeddings(),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
