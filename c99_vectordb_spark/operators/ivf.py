"""IVF-style approximate nearest-neighbor index (SURVEY §2.11).

The classic inverted-file layout, built with MLlib KMeans as the
coarse quantizer (the north star's "MLlib/DataFrame for batch vector
index build"):

- build: KMeans over (a sample of) the embedding table -> centroids;
  every vector is assigned to its nearest centroid ("posting list").
  The index is an ordinary DataFrame (cluster, id, vec) — at scale it
  is written as Parquet partitioned by ``cluster``, so a probe reads
  only the probed partitions (partition pruning does the "inverted
  file" part).
- search: for each query, rank centroids driver-side (tiny), take the
  ``nprobe`` nearest, and exact-score only the vectors in those
  clusters. Recall/latency trades off via nprobe exactly like FAISS
  IVF; nprobe = n_centroids degenerates to exact search.

Not DuckDB-oracle-checkable (KMeans initialization is engine-specific)
— verified instead by recall-vs-exact tests and by the nprobe=K
exactness property.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F


class IvfIndex:
    def __init__(self, centroids: list[list[float]], assigned: DataFrame):
        #: cluster centers, index = cluster id (driver-side; k is small)
        self.centroids = centroids
        #: (cluster INT, id BIGINT, vec ARRAY<...>) posting lists
        self.assigned = assigned

    def write(self, path: str) -> None:
        """Persist partitioned by cluster: a probe of p clusters then
        reads exactly p partitions."""
        self.assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)

    @staticmethod
    def read(spark: SparkSession, path: str, centroids: list[list[float]]):
        return IvfIndex(centroids, spark.read.parquet(path))


def build_ivf(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "id",
    vec_col: str = "vec",
    seed: int = 42,
    max_iter: int = 20,
) -> IvfIndex:
    """KMeans coarse quantizer + cluster assignment (one fit + one
    map-only assignment pass)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    data = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(data)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    assigned = model.transform(data).select(
        F.col("prediction").alias("cluster"), "id", "vec"
    )
    return IvfIndex(centroids, assigned)


def _sq_l2(a: list[float], b: list[float]) -> float:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _sq_l2_cols(a, b):
    """Squared L2 between two array columns, JVM-side."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_search_batch(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Serve a whole query TABLE in one plan (no per-query driver loop).

    1. centroids become a tiny (cluster, cvec) DataFrame; a broadcast
       join against the queries scores every (query, centroid) pair and
       a per-qid window keeps the ``nprobe`` nearest — the probe table
       (qid, cluster, qvec);
    2. one equi-join of the probe table against the cluster-partitioned
       index reads only probed posting lists (partition pruning /
       shuffle on ``cluster``), exact-scores the candidates, and a
       per-qid window keeps top ``k``.

    Plan size is O(1) in the number of queries — the driver loop in
    :func:`ivf_search` built one union branch per query. Results are
    identical (same score/tie rules); at nprobe = n_centroids this
    equals exact search (tests/test_ivf.py).
    """
    from pyspark.sql import Window

    spark = index.assigned.sparkSession
    cents = spark.createDataFrame(
        [(ci, vec) for ci, vec in enumerate(index.centroids)],
        "cluster INT, cvec ARRAY<DOUBLE>",
    )
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qvec")
    )
    w_probe = Window.partitionBy("qid").orderBy(F.asc("cdist"), F.asc("cluster"))
    probes = (
        q.join(F.broadcast(cents))
        .withColumn("cdist", _sq_l2_cols(F.col("qvec"), F.col("cvec")))
        .withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= nprobe)
        .select("qid", "qvec", "cluster")
    )
    w_topk = Window.partitionBy("qid").orderBy(F.asc("score"), F.asc("id"))
    # broadcast the tiny probe table: a plain equi-join would shuffle
    # the WHOLE index onto <= n_centroids hash keys (extreme skew) and
    # could never partition-prune; the broadcast join streams only the
    # probed posting lists (round-5 review finding)
    return (
        index.assigned.join(F.broadcast(probes), "cluster")
        .withColumn("score", F.round(_sq_l2_cols(F.col("vec"), F.col("qvec")), 4))
        .filter(F.col("id") != F.col("qid"))
        .withColumn("_rk", F.row_number().over(w_topk))
        .filter(F.col("_rk") <= k)
        .select("qid", "id", "score")
    )


def ivf_search(
    index: IvfIndex,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """Probe the ``nprobe`` nearest posting lists per query, exact
    squared-L2 rank within them. Returns (qid, id, score) DataFrame.

    Centroid ranking is driver-side (centroid count is tiny by
    construction); the cluster IN-filter prunes partitions when the
    index is stored partitioned by cluster.
    """
    from .recall import score_sq_l2

    spark = index.assigned.sparkSession
    out = None
    for qid, qvec in queries:
        ranked = sorted(
            range(len(index.centroids)),
            key=lambda c: (_sq_l2(index.centroids[c], qvec), c),
        )[:nprobe]
        cand = index.assigned.filter(F.col("cluster").isin([int(c) for c in ranked]))
        scored = (
            cand.withColumn("score", F.round(score_sq_l2(F.col("vec"), qvec), 4))
            .filter(F.col("id") != qid)
            .select(F.lit(qid).cast("long").alias("qid"), "id", "score")
            .orderBy(F.asc("score"), F.asc("id"))
            .limit(k)
        )
        out = scored if out is None else out.unionByName(scored)
    if out is None:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("qid", T.LongType()),
                    T.StructField("id", T.LongType()),
                    T.StructField("score", T.DoubleType()),
                ]
            ),
        )
    return out
