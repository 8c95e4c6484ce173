"""MLlib-backed batch vector index builds (BASELINE.json north star:
"MLlib/DataFrame for batch vector index build, not online ANN").

Wraps MinHashLSH and BucketedRandomProjectionLSH as batch operators
over DataFrame columns. These are the model-object counterparts of the
pure-expression LSH in similarity.py / dedup.py: MLlib owns the
hash-family parameters (seeded, persistable with the model writers),
while the expression versions keep everything visible to Catalyst and
the DuckDB oracle. Both produce the same *shape* of plan: bucket keys
-> equi-join -> verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _to_mllib_vectors(df: DataFrame, array_col: str, out_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(F.col(array_col).cast("array<double>")))


def brp_similarity_join(
    emb: DataFrame,
    threshold: float,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "id",
    vec_col: str = "vec",
    seed_model=None,
) -> DataFrame:
    """All-pairs similarity join under euclidean distance <= threshold
    via BucketedRandomProjectionLSH.approxSimilarityJoin.

    Output (id_a, id_b, dist) with id_a < id_b. The join is LSH-bucket
    equi-join + verify — no all-pairs shuffle.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    data = _to_mllib_vectors(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec",
        "features",
    )
    model = seed_model or BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    ).fit(data)
    joined = model.approxSimilarityJoin(data, data, threshold, distCol="dist")
    return (
        joined.select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round("dist", 4).alias("dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def minhash_similarity_join(
    docs: DataFrame,
    threshold: float = 0.6,
    num_hash_tables: int = 5,
    id_col: str = "id",
    body_col: str = "body",
    dim: int = 1 << 18,
) -> DataFrame:
    """Near-dup join on token-set Jaccard distance <= threshold via
    MinHashLSH over a HashingTF binary term-presence vector.

    Output (id_a, id_b, jaccard_dist). MLlib's MinHashLSH needs
    non-empty sparse vectors, so blank docs are filtered first.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    from ..functions import text as Ft

    base = docs.select(
        F.col(id_col).alias("id"), Ft.tokens(F.col(body_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=dim, binary=True)
    data = tf.transform(base)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    ).fit(data)
    joined = model.approxSimilarityJoin(data, data, threshold, distCol="jaccard_dist")
    return joined.select(
        F.col("datasetA.id").alias("id_a"),
        F.col("datasetB.id").alias("id_b"),
        F.round("jaccard_dist", 4).alias("jaccard_dist"),
    ).filter(F.col("id_a") < F.col("id_b"))
