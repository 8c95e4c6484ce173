"""Round-6 session-7 wave: sketch set algebra, distributed graph
traversal (BFS / k-core), winnowing fingerprints, binary-quantized
ANN, and three exact nonparametric/survival analytics operators —
each with a hash-exact DuckDB oracle twin.

Like the rest of the §2.11 tier these go beyond the reference's
surface (reference: memo_cli.py implements recall/filter/analyze
only) toward what a large-scale training-data pipeline needs; the
cross-engine exactness contract follows the repo conventions: md5-56
where hash bits are consumed positionally/uniformly, truncating
integer division on positive operands via ``div`` / ``//``, doubles
only through order-pinned left folds or algebraically closed
expressions, ``round(x, 4)`` before any float enters the output, and
every ranking tie-broken by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import hashing

# ---------------------------------------------------------------------------
# shared: Spark-side md5-56 (twin of hashing.duckdb_md5_hash56_sql)
# ---------------------------------------------------------------------------

def _spark_md5_56(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 14), 16, 10) AS bigint)"


# ---------------------------------------------------------------------------
# shared: the thresholded customer-supplier trade graph
# ---------------------------------------------------------------------------
#
# The raw cust-supplier bipartite graph is near-complete at any scale
# (every customer eventually buys from every supplier), so graph
# traversal over it is degenerate. Thresholding on >= 3 DISTINCT
# orders keeps only repeat-trade relationships — a sparse graph with
# real structure (at sf0.01: 789 nodes, 1168 edges, BFS diameter > 4,
# a nonempty 3-core). The threshold is part of the operator contract
# and mirrored in the oracle CTE.

_TRADE_MIN_ORDERS = 3


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("n_ord"))
        .filter(F.col("n_ord") >= _TRADE_MIN_ORDERS)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )


_TRADE_EDGES_CTE = f"""edges AS MATERIALIZED (
  SELECT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2 HAVING COUNT(DISTINCT l_orderkey) >= {_TRADE_MIN_ORDERS}
)"""


# ---------------------------------------------------------------------------
# graph_bfs_layers — multi-source BFS frontier expansion
# ---------------------------------------------------------------------------

_BFS_ROUNDS = 4
_BFS_N_SEEDS = 5  #: suppliers 0..4 -> nodes {1, 3, 5, 7, 9}


def q_graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the repeat-trade graph
    (operators/graph.bfs_layers): suppliers 0-4 are the layer-0 seed
    set; each round expands the frontier one hop. The output is the
    layer census (n_nodes, min/max node per layer) plus a layer = -1
    row for nodes NOT reached within 4 hops — at sf0.01 the graph has
    a genuine horizon (206 of 789 nodes unreached), so the census has
    verdict texture rather than collapsing to one giant layer.

    Scale shape: per round one frontier-adjacency equi-join + one
    distinct + one anti-join, adjacency partitioned once and reused
    (the pagerank discipline); the frontier is always node-sized,
    never edge-sized, and nothing collects. 100 TB story: this is the
    reachability primitive for lineage/contamination spread analysis
    over dedup-cluster graphs."""
    from .operators.graph import bfs_layers

    # the thresholded edge build (lineitem x orders + countDistinct) is
    # the expensive subtree; persist it so the adjacency inside
    # bfs_layers and the unreached-census node list below share ONE
    # materialization (plans are trees — without this the join+agg ran
    # twice: 5.9s -> 2.8s at sf0.1)
    edges = _trade_edges(spark, sf_dir).persist()
    seeds = spark.range(_BFS_N_SEEDS).select(
        (F.col("id") * 2 + 1).alias("node")
    )
    visited = bfs_layers(edges, seeds, rounds=_BFS_ROUNDS)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    census = visited.groupBy("layer").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("node").cast("long").alias("min_node"),
        F.max("node").cast("long").alias("max_node"),
    )
    unreached = (
        nodes.join(visited, "node", "left_anti")
        .agg(
            F.lit(-1).cast("long").alias("layer"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("min_node"),
            F.max("node").cast("long").alias("max_node"),
        )
    )
    return census.unionByName(unreached).orderBy("layer")


def _oracle_graph_bfs_layers() -> str:
    from .operators.graph import duckdb_bfs_layers_sql

    seeds = ", ".join(f"({2 * s + 1})" for s in range(_BFS_N_SEEDS))
    cte = f"""{_TRADE_EDGES_CTE},
seeds AS (SELECT * FROM (VALUES {seeds}) AS t(node))"""
    body = duckdb_bfs_layers_sql(cte, rounds=_BFS_ROUNDS)
    return f"""WITH {body}
SELECT layer, COUNT(*)::BIGINT AS n_nodes,
       MIN(node)::BIGINT AS min_node, MAX(node)::BIGINT AS max_node
FROM bfs_all GROUP BY layer
UNION ALL
SELECT -1::BIGINT, COUNT(*)::BIGINT, MIN(n)::BIGINT, MAX(n)::BIGINT
FROM (SELECT DISTINCT src AS n FROM bfs_adj
      WHERE src NOT IN (SELECT node FROM bfs_all))
ORDER BY layer
"""


# ---------------------------------------------------------------------------
# graph_kcore_peel — bounded-round k-core decomposition report
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 5


def q_graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling schedule over the repeat-trade graph
    (operators/graph.kcore_peel, k=3, 5 rounds): each round drops
    nodes of degree < k; one row per round records (nodes, edges,
    min_degree) remaining. At sf0.01 the schedule converges exactly at
    round 5 (min_degree reaches 3: 164 nodes / 326 edges survive), so
    the report demonstrates both the peel dynamics and the
    convergence certificate. The dense-subgraph extraction primitive
    for spam-farm / citation-ring detection at corpus scale."""
    from .operators.graph import kcore_peel

    return kcore_peel(
        _trade_edges(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS
    ).orderBy("round")


def _oracle_graph_kcore_peel() -> str:
    from .operators.graph import duckdb_kcore_peel_sql

    body = duckdb_kcore_peel_sql(
        _TRADE_EDGES_CTE, k=_KCORE_K, rounds=_KCORE_ROUNDS
    )
    return f"WITH {body}\nSELECT * FROM kc_report ORDER BY round"


# ---------------------------------------------------------------------------
# sketch_set_ops — KMV sketch set algebra (audience overlap)
# ---------------------------------------------------------------------------

_KMV_SET_K = 64
_U56 = 1 << 56


def q_sketch_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the mergeable-sketch story one level
    up from approx_distinct_kmv: per order priority, sketch the
    distinct-customer set as its k=64 minimum md5-56 hashes; for every
    priority PAIR estimate |A|, |B|, |A∪B| (bottom-k of the merged
    sketch — exactly the merge a 1000-executor rollup would ship),
    and |A∩B| via the Jaccard estimator on the union sketch
    (Beyer et al. 2007 / the theta-sketch intersection rule:
    jaccard = |U ∩ A ∩ B| / k over the k smallest union hashes).
    Each estimate is floored integer arithmetic ((k-1) * 2^56 //
    h_k), so the twin is hash-exact; the EXACT intersection/union
    (one equi-join on the hash) rides along, making per-pair
    estimator error (err_ppm) a first-class measured artifact — at
    sf0.01 the audience overlaps are ~76% Jaccard and the KMV
    estimates land within a few percent.

    Scale: the sketch is k hashes per group (mergeable, partial-agg
    friendly); the pair table is #groups^2 (tiny); only the exact
    twin touches the full distinct set, and it is itself one
    hash-keyed shuffle. md5-56, not the polynomial fold: KMV consumes
    hash MAGNITUDE uniformly (the repo's hash-choice rule)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    h = _spark_md5_56("concat('kmv:', cast(o_custkey AS string))")
    hashed = (
        orders.select(
            F.col("o_orderpriority").alias("p"), F.expr(h).alias("h")
        )
        .distinct()
    )
    sk = hashed.groupBy("p").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, _KMV_SET_K).alias("sk"),
        F.count(F.lit(1)).cast("long").alias("n_exact"),
    )
    a = sk.select(
        F.col("p").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_exact").alias("n_a"),
    )
    b = sk.select(
        F.col("p").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_exact").alias("n_b"),
    )
    # 5-row sketch table self-joined on a < b: a bounded nested-loop
    # by construction (#groups^2 pairs, never data-sized)
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    exact_i = (
        hashed.alias("x")
        .join(hashed.alias("y"), ["h"])
        .filter(F.col("x.p") < F.col("y.p"))
        .groupBy(
            F.col("x.p").alias("type_a"), F.col("y.p").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    k = _KMV_SET_K
    est = pairs.join(exact_i, ["type_a", "type_b"]).selectExpr(
        "type_a",
        "type_b",
        f"({k - 1}L * {_U56}L) div element_at(sk_a, {k}) AS est_a",
        f"({k - 1}L * {_U56}L) div element_at(sk_b, {k}) AS est_b",
        f"slice(array_sort(array_union(sk_a, sk_b)), 1, {k}) AS u",
        "sk_a",
        "sk_b",
        "n_a",
        "n_b",
        "exact_inter",
    )
    est = est.selectExpr(
        "type_a",
        "type_b",
        "est_a",
        "est_b",
        f"({k - 1}L * {_U56}L) div element_at(u, {k}) AS est_union",
        "size(filter(u, x -> array_contains(sk_a, x)"
        " AND array_contains(sk_b, x))) AS inter_k",
        "n_a + n_b - exact_inter AS exact_union",
        "exact_inter",
    )
    return est.selectExpr(
        "type_a",
        "type_b",
        "est_a",
        "est_b",
        "est_union",
        f"cast(1000000L * inter_k div {k} AS bigint) AS jaccard_est_ppm",
        f"(1000000L * inter_k div {k}) * est_union div 1000000 AS est_inter",
        "exact_inter",
        "exact_union",
        f"abs((1000000L * inter_k div {k}) * est_union div 1000000"
        " - exact_inter) * 1000000 div exact_union AS err_ppm",
    ).orderBy("type_a", "type_b")


def _oracle_sketch_set_ops() -> str:
    k = _KMV_SET_K
    h56 = hashing.duckdb_md5_hash56_sql(
        "('kmv:' || CAST(o_custkey AS VARCHAR))"
    )
    return f"""
WITH so_h AS (
  SELECT DISTINCT o_orderpriority AS p, {h56} AS h FROM orders
),
so_sk AS (
  SELECT p, (list_sort(list(h)))[1:{k}] AS sk, COUNT(*)::BIGINT AS n_exact
  FROM so_h GROUP BY p
),
so_xi AS (
  SELECT x.p AS type_a, y.p AS type_b, COUNT(*)::BIGINT AS exact_inter
  FROM so_h x JOIN so_h y ON x.h = y.h AND x.p < y.p
  GROUP BY 1, 2
),
so_pairs AS (
  SELECT a.p AS type_a, b.p AS type_b,
         ({k - 1}::BIGINT * {_U56}) // a.sk[{k}] AS est_a,
         ({k - 1}::BIGINT * {_U56}) // b.sk[{k}] AS est_b,
         (list_sort(list_distinct(a.sk || b.sk)))[1:{k}] AS u,
         a.sk AS sk_a, b.sk AS sk_b,
         a.n_exact AS n_a, b.n_exact AS n_b
  FROM so_sk a JOIN so_sk b ON a.p < b.p
),
so_est AS (
  SELECT type_a, type_b, est_a, est_b,
         ({k - 1}::BIGINT * {_U56}) // u[{k}] AS est_union,
         len(list_filter(u, x -> list_contains(sk_a, x)
                               AND list_contains(sk_b, x)))::BIGINT AS inter_k,
         x.exact_inter, n_a + n_b - x.exact_inter AS exact_union
  FROM so_pairs JOIN so_xi x USING (type_a, type_b)
)
SELECT type_a, type_b, est_a, est_b, est_union,
       ((1000000 * inter_k) // {k})::BIGINT AS jaccard_est_ppm,
       (((1000000 * inter_k) // {k}) * est_union // 1000000)::BIGINT
         AS est_inter,
       exact_inter, exact_union::BIGINT AS exact_union,
       (abs(((1000000 * inter_k) // {k}) * est_union // 1000000
            - exact_inter) * 1000000 // exact_union)::BIGINT AS err_ppm
FROM so_est
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# dedup_winnowing — MOSS winnowing fingerprints + near-dup pairs
# ---------------------------------------------------------------------------

_WIN_KGRAM = 20  #: char k-gram width (short grams = boilerplate noise)
_WIN_WINDOW = 8  #: winnowing window (guarantee: >= 1 fp per w grams)
_WIN_MAX_FREQ = 20  #: doc-frequency cap on fingerprints (skew control)
_WIN_JACC_PPM = 250_000  #: report pairs above this fingerprint Jaccard


def winnow_fingerprints(
    docs: DataFrame, kg: int = _WIN_KGRAM, w: int = _WIN_WINDOW
) -> DataFrame:
    """Distinct winnowing fingerprints per document: md5-56 every
    ``kg``-char gram of the whitespace-normalized text, keep the min
    hash of each sliding window of ``w`` gram hashes, dedup. Gram
    hashing and the window-min both run in array land inside one
    projection (transform + array_min(slice(...))) — per-doc map
    work, no per-position explode of the text, no window shuffle.
    Input needs (doc_id, text); output is (doc_id, fp)."""
    hexpr = _spark_md5_56(f"substring(t, i, {kg})")
    return (
        docs.select(
            "doc_id",
            F.expr(
                "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
            ).alias("t"),
        )
        .filter(F.length("t") >= kg + w - 1)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, length(t) - {kg - 1}),"
                f" i -> {hexpr})"
            ).alias("harr"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"array_distinct(transform("
                    f"sequence({w}, size(harr)),"
                    f" p -> array_min(slice(harr, p - {w - 1}, {w}))))"
                )
            ).alias("fp"),
        )
    )


def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every 20-char gram of the
    whitespace-normalized text, then keep the MINIMUM hash of each
    sliding window of 8 consecutive gram hashes; the distinct kept
    values are the doc's fingerprint set, with the paper's coverage
    guarantee (any match >= k+w-1 chars shares a fingerprint).
    Near-dup pairs = fingerprint equi-join, scored by fingerprint-set
    Jaccard; fingerprints appearing in > 20 docs are dropped first
    (boilerplate n-grams otherwise create hot join keys — the same
    skew cap as the MinHash/SimHash tiers). At sf0.01 the 25 planted
    near-dup pairs separate cleanly (Jaccard >= 0.5) from the 900-odd
    incidental-overlap pairs (< 0.25).

    Plan shape: gram hashing AND the window-min both happen in array
    land inside one projection (transform + array_min(slice(...))) —
    a per-doc map with NO per-position explode of the text and no
    window shuffle; only the distinct (doc, fp) pairs ever shuffle.
    Complements the MinHash tier: winnowing is position-anchored
    (plagiarism spans), MinHash is set-level (whole-doc
    similarity)."""
    # a single small parquet file arrives as ONE split, serializing
    # the md5-per-gram stage (~280 digests/doc); the shuffle moves
    # only doc rows (operators/multimodal._fan_out rationale —
    # measured 13.6s -> ~3s at sf0.1)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    fp = winnow_fingerprints(docs)
    rare = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _WIN_MAX_FREQ)
        .select("fp")
    )
    fpk = fp.join(rare, "fp", "semi")
    cnt = fpk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    )
    pairs = (
        fpk.alias("a")
        .join(fpk.alias("b"), ["fp"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
    )
    return (
        pairs.join(cnt.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_fp", "fp_a")
        .join(
            cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_fp", "fp_b"
            ),
            "doc_b",
        )
        .selectExpr(
            "doc_a",
            "doc_b",
            "shared_fps",
            "fp_a",
            "fp_b",
            "1000000L * shared_fps div (fp_a + fp_b - shared_fps)"
            " AS jaccard_ppm",
        )
        .filter(F.col("jaccard_ppm") >= _WIN_JACC_PPM)
        .orderBy("doc_a", "doc_b")
    )


def _oracle_dedup_winnowing() -> str:
    kg, w = _WIN_KGRAM, _WIN_WINDOW
    h56 = hashing.duckdb_md5_hash56_sql(f"substr(t, i, {kg})")
    return f"""
WITH wn_n AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
  FROM documents
),
wn_h AS (
  SELECT doc_id,
         list_transform(range(1, len(t) - {kg - 1} + 1),
                        i -> {h56}) AS harr
  FROM wn_n WHERE len(t) >= {kg + w - 1}
),
wn_fp AS (
  SELECT DISTINCT doc_id, fp
  FROM wn_h,
       unnest(list_distinct(list_transform(
           range({w}, len(harr) + 1),
           p -> list_min(harr[p - {w - 1}:p])))) AS u(fp)
),
wn_rare AS (
  SELECT fp FROM wn_fp GROUP BY fp HAVING COUNT(*) <= {_WIN_MAX_FREQ}
),
wn_k AS (SELECT f.* FROM wn_fp f JOIN wn_rare USING (fp)),
wn_cnt AS (SELECT doc_id, COUNT(*)::BIGINT AS n_fp FROM wn_k GROUP BY 1),
wn_p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS shared_fps
  FROM wn_k a JOIN wn_k b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared_fps, ca.n_fp AS fp_a, cb.n_fp AS fp_b,
       ((1000000 * shared_fps) // (ca.n_fp + cb.n_fp - shared_fps))::BIGINT
         AS jaccard_ppm
FROM wn_p
JOIN wn_cnt ca ON ca.doc_id = doc_a
JOIN wn_cnt cb ON cb.doc_id = doc_b
WHERE (1000000 * shared_fps) // (ca.n_fp + cb.n_fp - shared_fps)
      >= {_WIN_JACC_PPM}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# sim_binary_quant — 64-bit sign quantization + Hamming shortlist
# ---------------------------------------------------------------------------

_BQ_N_QUERIES = 8
_BQ_SHORTLIST = 20
_BQ_K = 5


def q_sim_binary_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (sign) quantization ANN — the 32x-compression tier below
    int8 SQ: each 64-d embedding becomes 64 sign bits packed into two
    BIGINT halves (32 bits each; a single 64-bit pack would overflow
    the signed accumulator and DuckDB errors on overflow where Spark
    wraps). Distance = Hamming via bit_count(xor) — pure JVM integer
    ops over the packed scan, 1 byte-equivalent per 4 float dims. Per
    query (the 8 lowest vec_ids): Hamming top-20 shortlist, exact
    cosine re-rank, top-5 reported with an in_exact_top5 flag against
    the exact cosine top-5 from the SAME scan — recall of the binary
    tier is measured in the row, not assumed. Sign bits and Hamming
    are integer-exact; cosine follows the repo float contract
    (round 4, ties by id)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bits = (
        "aggregate(sequence({lo}, {hi}), 0L, (acc, i) -> acc * 2L"
        " + (CASE WHEN element_at(embedding, i) > cast(0 AS float)"
        " THEN 1L ELSE 0L END))"
    )
    coded = emb.selectExpr(
        "vec_id AS id",
        "embedding",
        bits.format(lo=1, hi=32) + " AS code_hi",
        bits.format(lo=33, hi=64) + " AS code_lo",
    )
    queries = coded.filter(F.col("id") < _BQ_N_QUERIES).selectExpr(
        "id AS qid",
        "embedding AS qvec",
        "code_hi AS qhi",
        "code_lo AS qlo",
    )
    joined = (
        coded.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("qid"))
        .selectExpr(
            "qid",
            "id",
            "bit_count(code_hi ^ qhi) + bit_count(code_lo ^ qlo)"
            " AS hamming",
            "round(aggregate(zip_with(embedding, qvec,"
            " (x, y) -> cast(x AS double) * cast(y AS double)),"
            " 0.0D, (a, v) -> a + v)"
            " / (sqrt(aggregate(zip_with(embedding, embedding,"
            " (x, y) -> cast(x AS double) * cast(y AS double)),"
            " 0.0D, (a, v) -> a + v))"
            " * sqrt(aggregate(zip_with(qvec, qvec,"
            " (x, y) -> cast(x AS double) * cast(y AS double)),"
            " 0.0D, (a, v) -> a + v))), 4) AS cos",
        )
    )
    wham = Window.partitionBy("qid").orderBy(F.asc("hamming"), F.asc("id"))
    wexact = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    ranked = joined.withColumn("ham_rn", F.row_number().over(wham)).withColumn(
        "exact_rn", F.row_number().over(wexact)
    )
    shortlist = ranked.filter(F.col("ham_rn") <= _BQ_SHORTLIST)
    wrr = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        shortlist.withColumn("rerank_rn", F.row_number().over(wrr))
        .filter(F.col("rerank_rn") <= _BQ_K)
        .selectExpr(
            "qid",
            "id",
            "rerank_rn AS rank",
            "hamming",
            "cos",
            f"CASE WHEN exact_rn <= {_BQ_K} THEN 1L ELSE 0L END"
            " AS in_exact_top5",
        )
        .orderBy("qid", "rank")
    )


def _oracle_sim_binary_quant() -> str:
    # the SHARED cosine template (single source of truth — a local
    # copy would silently diverge if the similarity-family convention
    # ever changes; session code-review finding)
    from .queries_ext import _DUCK_DOT as dot

    bits = (
        "list_reduce([0::BIGINT] || list_transform(range({lo}, {hi} + 1),"
        " i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT ELSE 0::BIGINT"
        " END), (acc, b) -> acc * 2 + b)"
    )
    return f"""
WITH bq_c AS (
  SELECT vec_id AS id, embedding,
         {bits.format(lo=1, hi=32)} AS code_hi,
         {bits.format(lo=33, hi=64)} AS code_lo
  FROM embeddings
),
bq_q AS (
  SELECT id AS qid, embedding AS qvec, code_hi AS qhi, code_lo AS qlo
  FROM bq_c WHERE id < {_BQ_N_QUERIES}
),
bq_j AS (
  SELECT q.qid, c.id,
         bit_count(xor(c.code_hi, q.qhi))
           + bit_count(xor(c.code_lo, q.qlo)) AS hamming,
         ROUND({dot.format(a='c.embedding', b='q.qvec')}
               / (sqrt({dot.format(a='c.embedding', b='c.embedding')})
                  * sqrt({dot.format(a='q.qvec', b='q.qvec')})), 4) AS cos
  FROM bq_c c CROSS JOIN bq_q q
  WHERE c.id != q.qid
),
bq_r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY hamming ASC, id ASC) AS ham_rn,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cos DESC, id ASC) AS exact_rn
  FROM bq_j
),
bq_s AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY cos DESC, id ASC) AS rerank_rn
  FROM bq_r WHERE ham_rn <= {_BQ_SHORTLIST}
)
SELECT qid, id, rerank_rn::BIGINT AS rank, hamming::BIGINT AS hamming, cos,
       (CASE WHEN exact_rn <= {_BQ_K} THEN 1 ELSE 0 END)::BIGINT
         AS in_exact_top5
FROM bq_s WHERE rerank_rn <= {_BQ_K}
ORDER BY qid, rank
"""


# ---------------------------------------------------------------------------
# customer_survival_km — integerized Kaplan-Meier survival curve
# ---------------------------------------------------------------------------

_KM_BUCKET_DAYS = 30
_KM_CHURN_GAP_DAYS = 90


def q_customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of customer lifetime
    (Kaplan & Meier 1958), INTEGERIZED so the curve is hash-exact
    cross-engine: lifetime = days between a customer's first and last
    order, bucketed to 30-day periods; a customer whose last order
    precedes (global max date - 90 days) is an observed churn EVENT,
    later customers are right-CENSORED — the estimator's entire point
    is that censoring reduces the at-risk set without counting as
    death. S(t) runs the product-limit recurrence in parts-per-
    million with floored integer steps (S_t = S_{t-1} * (r_t - d_t)
    DIV r_t, S_0 = 1e6) — a float product would diverge in the last
    ulp across engines; the floored recurrence is exact and loses at
    most 1 ppm per step.

    The recurrence is inherently sequential over the curve, so it
    runs in ARRAY land on one collected curve row: the heavy work
    (per-customer min/max over orders) is a distributed aggregation,
    and the curve is bounded by max-lifetime/30 buckets (~70 rows at
    ANY data scale — time ranges grow with history, not row count),
    so the collect_list is report-sized by construction."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    mx = orders.agg(F.max("o_orderdate").alias("max_d"))
    per = cust.crossJoin(F.broadcast(mx)).selectExpr(
        f"datediff(l, f) div {_KM_BUCKET_DAYS} AS t",
        f"CASE WHEN l < max_d - INTERVAL {_KM_CHURN_GAP_DAYS} DAYS"
        " THEN 1L ELSE 0L END AS ev",
    )
    curve = per.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("ev").cast("long").alias("d"),
    )
    row = curve.agg(
        F.sort_array(F.collect_list(F.struct("t", "c", "d"))).alias("arr"),
        F.sum("c").cast("long").alias("total"),
    )
    arrs = row.selectExpr(
        "transform(arr, x -> x.t) AS t_arr",
        "transform(arr, x -> x.c) AS c_arr",
        "transform(arr, x -> x.d) AS d_arr",
        "size(arr) AS n",
        "total",
    ).selectExpr(
        "t_arr",
        "c_arr",
        "d_arr",
        "n",
        # at-risk count at bucket j = everyone not yet gone: total
        # minus all customers whose lifetime ended in earlier buckets
        "transform(sequence(1, n), j -> total"
        " - aggregate(slice(c_arr, 1, j - 1), 0L, (a, x) -> a + x))"
        " AS risk_arr",
    ).selectExpr(
        "t_arr",
        "c_arr",
        "d_arr",
        "n",
        "risk_arr",
        "transform(sequence(1, n), i -> aggregate(sequence(1, i),"
        " 1000000L, (acc, j) -> (acc * (element_at(risk_arr, j)"
        " - element_at(d_arr, j))) div element_at(risk_arr, j)))"
        " AS surv_arr",
    )
    return (
        arrs.select(
            F.posexplode(F.expr("sequence(1, n)")).alias("pos0", "i"),
            "t_arr",
            "c_arr",
            "d_arr",
            "risk_arr",
            "surv_arr",
        )
        .selectExpr(
            "element_at(t_arr, i) AS t_bucket",
            "element_at(risk_arr, i) AS n_risk",
            "element_at(d_arr, i) AS n_events",
            "element_at(c_arr, i) - element_at(d_arr, i) AS n_censored",
            "element_at(surv_arr, i) AS surv_ppm",
        )
        .orderBy("t_bucket")
    )


def _oracle_customer_survival_km() -> str:
    return f"""
WITH km_c AS (
  SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
  FROM orders GROUP BY 1
),
km_m AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
km_per AS (
  SELECT date_diff('day', f, l) // {_KM_BUCKET_DAYS} AS t,
         CASE WHEN l < max_d - INTERVAL {_KM_CHURN_GAP_DAYS} DAY
              THEN 1::BIGINT ELSE 0::BIGINT END AS ev
  FROM km_c CROSS JOIN km_m
),
km_curve AS (
  SELECT t, COUNT(*)::BIGINT AS c, SUM(ev)::BIGINT AS d
  FROM km_per GROUP BY 1
),
km_row AS (
  SELECT list(t ORDER BY t) AS t_arr,
         list(c ORDER BY t) AS c_arr,
         list(d ORDER BY t) AS d_arr,
         COUNT(*)::BIGINT AS n,
         SUM(c)::BIGINT AS total
  FROM km_curve
),
km_arrs AS (
  SELECT t_arr, c_arr, d_arr, n,
         list_transform(range(1, n + 1),
             j -> total - COALESCE(list_sum(c_arr[1:j - 1]), 0)) AS risk_arr
  FROM km_row
),
km_s AS (
  SELECT t_arr, c_arr, d_arr, n, risk_arr,
         list_transform(range(1, n + 1),
             i -> list_reduce(
                 [1000000::BIGINT] || list_transform(range(1, i + 1), j -> j),
                 (acc, j) -> (acc * (risk_arr[j] - d_arr[j])) // risk_arr[j]))
           AS surv_arr
  FROM km_arrs
)
SELECT t_arr[i]::BIGINT AS t_bucket,
       risk_arr[i]::BIGINT AS n_risk,
       d_arr[i]::BIGINT AS n_events,
       (c_arr[i] - d_arr[i])::BIGINT AS n_censored,
       surv_arr[i]::BIGINT AS surv_ppm
FROM km_s, unnest(range(1, n + 1)) AS u(i)
ORDER BY t_bucket
"""


# ---------------------------------------------------------------------------
# orders_theilsen_trend — robust median-of-slopes trend
# ---------------------------------------------------------------------------


def q_orders_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue (Theil 1950 / Sen
    1968): the median of all pairwise month-to-month revenue slopes —
    the estimator a single outlier month cannot move, reported next
    to the OLS slope it robustifies. Everything is exact: revenue is
    summed in integer cents, each pairwise slope is floored to
    milli-cents/month ((1000 * Δrev) div Δm — truncating on both
    engines, documented), and the median is the LOWER median
    (element (n+1) div 2 of the sorted slope list) so no float mean
    of middle elements exists. The OLS slope is the one float in the
    row, computed from order-pinned integer sums (closed-form, no
    fold-order exposure) and rounded to 4.

    The month table is bounded by calendar span, not data volume
    (~80 rows at any SF — the same report-sized-curve argument as the
    KM estimator), so the O(months^2) slope array lives in one
    projection; the heavy part — revenue per month — is one
    distributed aggregation."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mon = orders.selectExpr(
        "year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m",
        "cast(round(o_totalprice * 100) AS bigint) AS rc",
    ).groupBy("m").agg(F.sum("rc").cast("long").alias("rev"))
    row = mon.agg(
        F.sort_array(F.collect_list(F.struct("m", "rev"))).alias("arr"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    slopes = row.selectExpr(
        "arr",
        "n",
        "array_sort(flatten(transform(sequence(1, n - 1),"
        " i -> transform(sequence(i + 1, n),"
        " j -> (1000L * (arr[j - 1].rev - arr[i - 1].rev))"
        " div (arr[j - 1].m - arr[i - 1].m))))) AS sl",
    ).selectExpr(
        "arr",
        "n",
        "size(sl) AS n_pairs",
        "element_at(sl, cast((size(sl) + 1) div 2 AS int)) AS slope_milli",
    )
    inter = slopes.selectExpr(
        "arr",
        "n",
        "n_pairs",
        "slope_milli",
        "element_at(array_sort(transform(arr,"
        " x -> 1000L * x.rev - slope_milli * x.m)),"
        " cast((n + 1) div 2 AS int)) AS intercept_milli",
        # OLS from order-pinned integer sums; the only float column
        "aggregate(arr, 0L, (a, x) -> a + x.m) AS sx",
        "aggregate(arr, 0L, (a, x) -> a + x.rev) AS sy",
        "aggregate(arr, 0L, (a, x) -> a + x.m * x.rev) AS sxy",
        "aggregate(arr, 0L, (a, x) -> a + x.m * x.m) AS sxx",
    )
    return inter.selectExpr(
        "n AS n_months",
        "n_pairs",
        "slope_milli AS theilsen_slope_milli",
        "intercept_milli AS theilsen_intercept_milli",
        "round(1000.0D * (cast(n AS double) * cast(sxy AS double)"
        " - cast(sx AS double) * cast(sy AS double))"
        " / (cast(n AS double) * cast(sxx AS double)"
        " - cast(sx AS double) * cast(sx AS double)), 4)"
        " AS ols_slope_milli",
    )


def _oracle_orders_theilsen_trend() -> str:
    return """
WITH ts_mon AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
         SUM(ROUND(o_totalprice * 100)::BIGINT)::BIGINT AS rev
  FROM orders GROUP BY 1
),
ts_row AS (
  SELECT list(m ORDER BY m) AS m_arr, list(rev ORDER BY m) AS r_arr,
         COUNT(*)::BIGINT AS n
  FROM ts_mon
),
ts_sl AS (
  SELECT m_arr, r_arr, n,
         list_sort(flatten(list_transform(range(1, n),
             i -> list_transform(range(i + 1, n + 1),
                 j -> (1000 * (r_arr[j] - r_arr[i]))
                      // (m_arr[j] - m_arr[i]))))) AS sl
  FROM ts_row
),
ts_med AS (
  SELECT m_arr, r_arr, n, len(sl)::BIGINT AS n_pairs,
         sl[(len(sl) + 1) // 2] AS slope_milli
  FROM ts_sl
)
SELECT n AS n_months, n_pairs,
       slope_milli::BIGINT AS theilsen_slope_milli,
       (list_sort(list_transform(range(1, n + 1),
            i -> 1000 * r_arr[i] - slope_milli * m_arr[i]))
        )[(n + 1) // 2]::BIGINT AS theilsen_intercept_milli,
       ROUND(1000.0 * (n::DOUBLE * list_reduce([0::BIGINT]
                 || list_transform(range(1, n + 1),
                        i -> m_arr[i] * r_arr[i]),
                 (a, x) -> a + x)::DOUBLE
             - list_sum(m_arr)::DOUBLE * list_sum(r_arr)::DOUBLE)
           / (n::DOUBLE * list_reduce([0::BIGINT]
                 || list_transform(range(1, n + 1),
                        i -> m_arr[i] * m_arr[i]),
                 (a, x) -> a + x)::DOUBLE
             - list_sum(m_arr)::DOUBLE * list_sum(m_arr)::DOUBLE), 4)
         AS ols_slope_milli
FROM ts_med
"""


# ---------------------------------------------------------------------------
# orders_mann_whitney — rank-sum test, exact integer ranks
# ---------------------------------------------------------------------------


def q_orders_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum panel: each order-priority group tested
    against the other four pooled — does any priority's price
    distribution differ in LOCATION? Ranks are EXACT with proper
    tie handling and never float: prices integerize to cents, one
    global row_number (via the range-stitch global_rank — no
    single-task window), and each tied price's doubled average rank
    is min(rn) + max(rn) (row numbers within a tie run are
    consecutive). The doubled rank-sum R2_g then gives 2U_g = R2_g -
    n_g(n_g+1) in pure BIGINT. The z-score uses the tie-corrected
    variance (sum of t^3 - t over tie groups) — computed in doubles
    from the exact integer sums (closed form, no fold-order
    exposure) and rounded to 4; the significance flag compares the
    ROUNDED z so both engines flag identically. On uniform synthetic
    prices no priority should fire — the null holding IS the verdict
    texture."""
    from .operators.scalable_window import global_rank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o = orders.selectExpr(
        "o_orderpriority AS grp",
        "cast(round(o_totalprice * 100) AS bigint) AS cents",
        "o_orderkey",
    )
    ranked = global_rank(o, [F.asc("cents"), F.asc("o_orderkey")], "rn")
    per_price = ranked.groupBy("cents").agg(
        (F.min("rn") + F.max("rn")).cast("long").alias("rank2"),
        F.count(F.lit(1)).cast("long").alias("tcnt"),
    )
    per_gp = ranked.groupBy("cents", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    r2 = (
        per_gp.join(per_price, "cents")
        .groupBy("grp")
        .agg(
            F.sum(F.col("cnt") * F.col("rank2")).cast("long").alias("r2"),
            F.sum("cnt").cast("long").alias("n_g"),
        )
    )
    glob = per_price.agg(
        F.sum("tcnt").cast("long").alias("n"),
        F.sum(
            F.col("tcnt") * F.col("tcnt") * F.col("tcnt") - F.col("tcnt")
        ).cast("long").alias("tie_t"),
    )
    out = r2.crossJoin(F.broadcast(glob)).selectExpr(
        "grp AS o_orderpriority",
        "n_g",
        "r2 - n_g * (n_g + 1) AS u2",
        "round((cast(r2 - n_g * (n_g + 1) AS double)"
        " - cast(n_g AS double) * cast(n - n_g AS double))"
        " / (2.0D * sqrt(cast(n_g AS double) * cast(n - n_g AS double)"
        " / 12.0D * (cast(n + 1 AS double)"
        " - cast(tie_t AS double) / (cast(n AS double)"
        " * cast(n - 1 AS double))))), 4) AS z",
    )
    return out.selectExpr(
        "o_orderpriority",
        "n_g",
        "u2",
        "z",
        "CASE WHEN abs(z) > 1.96D THEN 1L ELSE 0L END AS significant",
    ).orderBy("o_orderpriority")


def _oracle_orders_mann_whitney() -> str:
    return """
WITH mw_o AS (
  SELECT o_orderpriority AS grp,
         ROUND(o_totalprice * 100)::BIGINT AS cents, o_orderkey
  FROM orders
),
mw_r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn FROM mw_o
),
mw_pp AS (
  SELECT cents, (MIN(rn) + MAX(rn))::BIGINT AS rank2,
         COUNT(*)::BIGINT AS tcnt
  FROM mw_r GROUP BY 1
),
mw_gp AS (
  SELECT cents, grp, COUNT(*)::BIGINT AS cnt FROM mw_r GROUP BY 1, 2
),
mw_r2 AS (
  SELECT grp, SUM(g.cnt * p.rank2)::BIGINT AS r2, SUM(g.cnt)::BIGINT AS n_g
  FROM mw_gp g JOIN mw_pp p USING (cents) GROUP BY 1
),
mw_gl AS (
  SELECT SUM(tcnt)::BIGINT AS n,
         SUM(tcnt * tcnt * tcnt - tcnt)::BIGINT AS tie_t
  FROM mw_pp
)
SELECT grp AS o_orderpriority, n_g,
       (r2 - n_g * (n_g + 1))::BIGINT AS u2,
       ROUND(((r2 - n_g * (n_g + 1))::DOUBLE
              - n_g::DOUBLE * (n - n_g)::DOUBLE)
             / (2.0 * sqrt(n_g::DOUBLE * (n - n_g)::DOUBLE / 12.0
                * ((n + 1)::DOUBLE
                   - tie_t::DOUBLE / (n::DOUBLE * (n - 1)::DOUBLE)))), 4)
         AS z,
       (CASE WHEN abs(ROUND(((r2 - n_g * (n_g + 1))::DOUBLE
              - n_g::DOUBLE * (n - n_g)::DOUBLE)
             / (2.0 * sqrt(n_g::DOUBLE * (n - n_g)::DOUBLE / 12.0
                * ((n + 1)::DOUBLE
                   - tie_t::DOUBLE / (n::DOUBLE * (n - 1)::DOUBLE)))), 4))
             > 1.96 THEN 1 ELSE 0 END)::BIGINT AS significant
FROM mw_r2 CROSS JOIN mw_gl
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# sim_mutual_nn — reciprocal nearest neighbors (bitext-mining shape)
# ---------------------------------------------------------------------------


def sim_mutual_nn_best(emb: DataFrame, staged: bool = True) -> DataFrame:
    """The per-point top-1 LSH neighbor table (qid, id, score) that
    feeds the reciprocal join — naive (lsh_bucketed_neighbors, the
    two-big-sets bucket join over raw points) or STAGED through the
    unique-vector collapse (the r7-judge fix for the sf1
    quadratic-in-duplicate-cluster tail; see the collapse comment in
    operators/similarity.py). The staged path computes the cosine
    once per unique-vector pair with the SAME float expressions, then
    tier-pruned-expands to a point-level edge set that contains every
    point's true top-1, so the selected rows — and the oracle hash —
    are identical by construction. Kept callable both ways so the
    dup-heavy fixture test can assert naive == staged row equality."""
    from .operators.similarity import (
        _dot,
        _norm,
        bucket_id,
        lsh_bucketed_neighbors,
        tier_pruned_expand,
        vec_exact_collapse,
    )
    from .queries_ext import LSH_DIM, LSH_PLANES

    e_pts = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    if not staged:
        return lsh_bucketed_neighbors(
            e_pts,
            emb.select(
                F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
            ),
            dim=LSH_DIM,
            k=1,
            n_planes=LSH_PLANES,
            multiprobe=True,
            broadcast_queries=False,
        )
    uniq, mem = vec_exact_collapse(e_pts)
    e = uniq.select(
        F.col("id").alias("rb"),
        F.col("vec"),
        bucket_id(F.col("vec"), LSH_DIM, LSH_PLANES).alias("bucket"),
        _norm(F.col("vec")).alias("vnorm"),
    )
    q = uniq.select(
        F.col("id").alias("ra"),
        F.col("vec").alias("qvec"),
        bucket_id(F.col("vec"), LSH_DIM, LSH_PLANES).alias("bucket"),
        _norm(F.col("vec")).alias("qnorm"),
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(LSH_PLANES)],
    )
    q = q.withColumn("bucket", F.explode(probes))
    # NO ra != rb filter: the self pair carries the k_A - 1
    # identical-vector candidates every cluster member sees
    rep_cand = (
        e.join(q, "bucket")
        .withColumn(
            "score",
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (F.col("vnorm") * F.col("qnorm")),
                4,
            ),
        )
        .withColumn("m", -F.col("score"))
        .select("ra", "rb", "m", "score")
    )
    edges = tier_pruned_expand(rep_cand, uniq, mem, k=1, payload_cols=("score",))
    w = Window.partitionBy("qid").orderBy(F.asc("m"), F.asc("id"))
    return (
        edges.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("qid", "id", "score")
    )


def q_sim_mutual_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest neighbors: pairs (a, b) where b is a's top-1
    LSH-bucketed neighbor AND a is b's — the reciprocity filter of
    bitext mining (Artetxe & Schwenk 2019) and of high-precision
    semantic dedup: a one-directional top-1 fires on hubs, the
    mutual pair almost never does. Candidates come from hamming-1
    multiprobe bucket equi-joins over UNIQUE vectors (the staged
    collapse — identical vectors have identical buckets and scores,
    so per-point top-1 expands exactly; sf1's 90%-dup corpus measured
    the raw-point join at ~198 s vs seconds staged), and the
    reciprocal join touches only the node-sized best-neighbor
    table."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    best = sim_mutual_nn_best(emb, staged=True)
    x, y = best.alias("x"), best.alias("y")
    return (
        x.join(
            y,
            (F.col("x.qid") == F.col("y.id"))
            & (F.col("x.id") == F.col("y.qid"))
            & (F.col("x.qid") < F.col("x.id")),
        )
        .select(
            F.col("x.qid").alias("id_a"),
            F.col("x.id").alias("id_b"),
            F.col("x.score").alias("cos"),
        )
        .orderBy("id_a")
    )


def _oracle_sim_mutual_nn() -> str:
    from .operators.similarity import hyperplane
    from .queries_ext import _DUCK_DOT, LSH_DIM, LSH_PLANES

    def plane_lit(p: int) -> str:
        return "[" + ", ".join(f"{x!r}::DOUBLE" for x in hyperplane(p, LSH_DIM)) + "]"

    bucket = " + ".join(
        f"(CASE WHEN {_DUCK_DOT.format(a='embedding', b=plane_lit(p))} >= 0"
        f" THEN 1::BIGINT ELSE 0 END << {p})"
        for p in range(LSH_PLANES)
    )
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << p})" for p in range(LSH_PLANES)]
    )
    return f"""
WITH mn_e AS (
  SELECT vec_id AS id, embedding, ({bucket}) AS bucket FROM embeddings
),
mn_q AS (
  SELECT id AS qid, embedding AS qvec, pbucket
  FROM mn_e, unnest([{probes}]) AS u(pbucket)
),
mn_c AS (
  SELECT q.qid, e.id,
         ROUND({_DUCK_DOT.format(a='e.embedding', b='q.qvec')}
               / (sqrt({_DUCK_DOT.format(a='e.embedding', b='e.embedding')})
                  * sqrt({_DUCK_DOT.format(a='q.qvec', b='q.qvec')})), 4)
           AS score
  FROM mn_e e JOIN mn_q q ON e.bucket = q.pbucket
  WHERE e.id != q.qid
),
mn_b AS (
  SELECT qid, id, score FROM (
    SELECT qid, id, score,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY score DESC, id ASC) AS rnk
    FROM mn_c
  ) WHERE rnk = 1
)
SELECT x.qid AS id_a, x.id AS id_b, x.score AS cos
FROM mn_b x JOIN mn_b y
  ON x.qid = y.id AND x.id = y.qid AND x.qid < x.id
ORDER BY id_a
"""


# ---------------------------------------------------------------------------
# dedup_cdc_chunks — content-defined chunking storage-dedup report
# ---------------------------------------------------------------------------

_CDC_GRAM = 16  #: rolling-window width for the boundary test
_CDC_MASK = 64  #: boundary when hash % MASK == 0 -> ~64-char chunks


def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the FastCDC/LBFS family, Muthitacharoen
    et al. 2001): chunk boundaries fall where the rolling 16-char
    window's hash ≡ 0 (mod 64), so an insertion re-chunks only its
    neighborhood instead of shifting every fixed-size block — THE
    storage-dedup primitive for snapshot-heavy corpora. Per source:
    chunk counts, unique-chunk counts (by content hash) and the ppm
    byte savings exact-integer. Boundary detection and segment
    extraction both run in array land per doc (one projection, no
    per-position explode); only (source, chunk-hash, len) rows ever
    shuffle."""
    h = _spark_md5_56(f"substring(t, i - {_CDC_GRAM - 1}, {_CDC_GRAM})")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    chunks = (
        docs.select(
            "source",
            F.expr(
                "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
            ).alias("t"),
        )
        .filter(F.length("t") > 0)
        .select(
            "source",
            "t",
            F.expr(
                f"concat(array(0L), CASE WHEN length(t) >= {_CDC_GRAM}"
                f" THEN filter(transform(sequence({_CDC_GRAM}, length(t)),"
                f" i -> CASE WHEN ({h}) % {_CDC_MASK} = 0 THEN cast(i AS"
                " bigint) ELSE -1L END), x -> x > 0) ELSE array() END,"
                " array(cast(length(t) AS bigint))) AS bounds"
            ),
        )
        .select(
            "source",
            F.explode(
                F.expr(
                    "filter(transform(sequence(1, size(bounds) - 1),"
                    " j -> substring(t, cast(element_at(bounds, j) + 1 AS int),"
                    " cast(element_at(bounds, j + 1) - element_at(bounds, j)"
                    " AS int))), c -> length(c) > 0)"
                )
            ).alias("chunk"),
        )
        .select(
            "source",
            F.expr(_spark_md5_56("chunk")).alias("h"),
            F.length("chunk").cast("long").alias("clen"),
        )
    )
    per_hash = chunks.groupBy("source", "h").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min("clen").alias("clen"),
    )
    return (
        per_hash.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_chunks"),
            F.count(F.lit(1)).cast("long").alias("n_unique"),
            F.sum(F.col("cnt") * F.col("clen")).cast("long").alias(
                "total_chars"
            ),
            F.sum("clen").cast("long").alias("unique_chars"),
        )
        .selectExpr(
            "source",
            "n_chunks",
            "n_unique",
            "total_chars",
            "unique_chars",
            "total_chars div n_chunks AS avg_chunk_len",
            "1000000L * (total_chars - unique_chars) div total_chars"
            " AS savings_ppm",
        )
        .orderBy("source")
    )


def _oracle_dedup_cdc_chunks() -> str:
    h = hashing.duckdb_md5_hash56_sql(
        f"substr(t, i - {_CDC_GRAM - 1}, {_CDC_GRAM})"
    )
    ch = hashing.duckdb_md5_hash56_sql("chunk")
    return f"""
WITH cdc_n AS (
  SELECT source, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
  FROM documents WHERE len(text) > 0
),
cdc_b AS (
  SELECT source, t,
         [0::BIGINT]
         || (CASE WHEN len(t) >= {_CDC_GRAM}
             THEN list_filter(list_transform(
                      range({_CDC_GRAM}, len(t) + 1),
                      i -> CASE WHEN ({h}) % {_CDC_MASK} = 0
                           THEN i::BIGINT ELSE -1::BIGINT END),
                  x -> x > 0)
             ELSE [] END)
         || [len(t)::BIGINT] AS bounds
  FROM cdc_n WHERE len(t) > 0
),
cdc_c AS (
  SELECT source, chunk FROM (
    SELECT source,
           unnest(list_transform(range(1, len(bounds)),
               j -> substr(t, (bounds[j] + 1)::INT,
                           (bounds[j + 1] - bounds[j])::INT))) AS chunk
    FROM cdc_b
  ) WHERE len(chunk) > 0
),
cdc_h AS (
  SELECT source, {ch} AS h, len(chunk)::BIGINT AS clen FROM cdc_c
),
cdc_u AS (
  SELECT source, h, COUNT(*)::BIGINT AS cnt, MIN(clen) AS clen
  FROM cdc_h GROUP BY 1, 2
),
cdc_s AS (
  SELECT source, SUM(cnt)::BIGINT AS n_chunks, COUNT(*)::BIGINT AS n_unique,
         SUM(cnt * clen)::BIGINT AS total_chars,
         SUM(clen)::BIGINT AS unique_chars
  FROM cdc_u GROUP BY 1
)
SELECT source, n_chunks, n_unique, total_chars, unique_chars,
       (total_chars // n_chunks)::BIGINT AS avg_chunk_len,
       ((1000000 * (total_chars - unique_chars)) // total_chars)::BIGINT
         AS savings_ppm
FROM cdc_s
ORDER BY source
"""


# ---------------------------------------------------------------------------
# corpus_pmi_pairs — collocation mining via integer log2 PMI
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 20
_PMI_TOP = 20
_Q20 = 1 << 20


def q_corpus_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations (Church & Hanks
    1990): the bigram/unigram log-ratio that surfaces multiword
    expressions for tokenizer vocab work. PMI decomposes into five
    integer plog2 terms (the shared q10 piecewise-linear log2 — no
    libm): pmi_q10 = plog2(c_ab) + 2 plog2(N_uni) - plog2(N_bi) -
    plog2(c_a) - plog2(c_b), each argument lifted to q20 first, so
    the score is hash-exact cross-engine. Unigram counts broadcast
    (vocab-sized); totals are a 1-row broadcast; min-count 20 gates
    noise before the joins."""
    from .functions.text import tokens
    from .operators.corpus import _plog2_cols

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens(F.col("text"))
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    totals = uni.agg(F.sum("c").cast("long").alias("n_uni")).crossJoin(
        docs.select(F.explode(pairs).alias("p"))
        .filter(F.col("p.w2").isNotNull())
        .agg(F.count(F.lit(1)).cast("long").alias("n_bi"))
    )
    scored = (
        bi.join(
            F.broadcast(uni.selectExpr("w AS w1", "c AS c_a")), "w1"
        )
        .join(F.broadcast(uni.selectExpr("w AS w2", "c AS c_b")), "w2")
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "w1",
            "w2",
            "c_ab",
            "c_a",
            "c_b",
            f"{_plog2_cols(f'(c_ab * {_Q20}L)')}"
            f" + 2L * {_plog2_cols(f'(n_uni * {_Q20}L)')}"
            f" - {_plog2_cols(f'(n_bi * {_Q20}L)')}"
            f" - {_plog2_cols(f'(c_a * {_Q20}L)')}"
            f" - {_plog2_cols(f'(c_b * {_Q20}L)')} AS pmi_q10",
        )
    )
    return scored.orderBy(
        F.desc("pmi_q10"), F.asc("w1"), F.asc("w2")
    ).limit(_PMI_TOP)


def _oracle_corpus_pmi_pairs() -> str:
    toks = hashing.duckdb_tokens_sql("text")
    pl = hashing.duckdb_plog2_sql
    return f"""
WITH pmi_tok AS (SELECT doc_id, {toks} AS ts FROM documents),
pmi_uni AS (
  SELECT w, COUNT(*)::BIGINT AS c
  FROM (SELECT unnest(ts) AS w FROM pmi_tok) GROUP BY w
),
pmi_bi AS (
  SELECT w1, w2, COUNT(*)::BIGINT AS c_ab FROM (
    SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
           unnest(list_transform(range(1, len(ts)), i -> ts[i + 1])) AS w2
    FROM pmi_tok
  ) GROUP BY 1, 2 HAVING COUNT(*) >= {_PMI_MIN_COUNT}
),
pmi_tot AS (
  SELECT (SELECT SUM(c) FROM pmi_uni)::BIGINT AS n_uni,
         (SELECT SUM(len(ts) - 1) FROM pmi_tok WHERE len(ts) > 0)::BIGINT
           AS n_bi
)
SELECT w1, w2, c_ab, a.c AS c_a, b.c AS c_b,
       ({pl(f'(c_ab * {_Q20})')}
        + 2 * {pl(f'(n_uni * {_Q20})')}
        - {pl(f'(n_bi * {_Q20})')}
        - {pl(f'(a.c * {_Q20})')}
        - {pl(f'(b.c * {_Q20})')})::BIGINT AS pmi_q10
FROM pmi_bi
JOIN pmi_uni a ON a.w = w1
JOIN pmi_uni b ON b.w = w2
CROSS JOIN pmi_tot
ORDER BY pmi_q10 DESC, w1 ASC, w2 ASC
LIMIT {_PMI_TOP}
"""


# ---------------------------------------------------------------------------
# customer_cohort_ltv — cohort lifetime-value matrix
# ---------------------------------------------------------------------------


def q_customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV matrix — the subscription-analytics standard report:
    customers cohorted by first-order month; for each (cohort, age in
    months) cell, active customers, revenue, CUMULATIVE revenue, and
    LTV (cumulative cents per cohort member, floored). Revenue stays
    exact integer cents; the cumulative is a PARTITIONED window
    (partition = cohort — never a global sort); the matrix is bounded
    by calendar-months^2 at any data volume."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o = orders.selectExpr(
        "o_custkey",
        "year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym",
        "cast(round(o_totalprice * 100) AS bigint) AS cents",
    )
    first = o.groupBy("o_custkey").agg(F.min("ym").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        o.join(first, "o_custkey")
        .selectExpr("cohort", "ym - cohort AS age", "o_custkey", "cents")
        .groupBy("cohort", "age")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_active"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.withColumn("cum_rev_cents", F.sum("rev_cents").over(w))
        .join(F.broadcast(sizes), "cohort")
        .selectExpr(
            "cohort",
            "age",
            "cohort_size",
            "n_active",
            "rev_cents",
            "cast(cum_rev_cents AS bigint) AS cum_rev_cents",
            "cum_rev_cents div cohort_size AS ltv_cents",
        )
        .orderBy("cohort", "age")
    )


_ORACLE_CUSTOMER_COHORT_LTV = """
WITH ltv_o AS (
  SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
         ROUND(o_totalprice * 100)::BIGINT AS cents
  FROM orders
),
ltv_f AS (SELECT o_custkey, MIN(ym) AS cohort FROM ltv_o GROUP BY 1),
ltv_sz AS (
  SELECT cohort, COUNT(*)::BIGINT AS cohort_size FROM ltv_f GROUP BY 1
),
ltv_c AS (
  SELECT f.cohort, o.ym - f.cohort AS age,
         COUNT(DISTINCT o.o_custkey)::BIGINT AS n_active,
         SUM(o.cents)::BIGINT AS rev_cents
  FROM ltv_o o JOIN ltv_f f USING (o_custkey)
  GROUP BY 1, 2
),
ltv_w AS (
  SELECT *, SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY age
                                 ROWS UNBOUNDED PRECEDING) AS cum_rev_cents
  FROM ltv_c
)
SELECT w.cohort, w.age, s.cohort_size, w.n_active, w.rev_cents,
       w.cum_rev_cents::BIGINT AS cum_rev_cents,
       (w.cum_rev_cents // s.cohort_size)::BIGINT AS ltv_cents
FROM ltv_w w JOIN ltv_sz s USING (cohort)
ORDER BY w.cohort, w.age
"""


# ---------------------------------------------------------------------------
# orders_kruskal_wallis — K-group rank test (one verdict row)
# ---------------------------------------------------------------------------

#: chi-square 95% critical value for dof = 4 (5 priority groups), ppm
_KW_CHI2_95_4DOF_PPM = 9_487_729


def q_orders_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: the K-group generalization of the
    Mann-Whitney panel — ONE omnibus test of whether ANY order
    priority's price distribution differs in location. Shares the
    exact-rank machinery: one range-stitch global rank, doubled
    average ranks per tied price (min+max row numbers), per-group
    doubled rank sums in pure BIGINT; H and its tie correction are
    closed-form doubles from the exact integer sums (R2^2 would
    overflow int64 at ~3e9 rows — the division happens in doubles),
    rounded to 4. The null holds on uniform synthetic prices — the
    expected non-firing IS the verdict."""
    from .operators.scalable_window import global_rank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o = orders.selectExpr(
        "o_orderpriority AS grp",
        "cast(round(o_totalprice * 100) AS bigint) AS cents",
        "o_orderkey",
    )
    ranked = global_rank(o, [F.asc("cents"), F.asc("o_orderkey")], "rn")
    per_price = ranked.groupBy("cents").agg(
        (F.min("rn") + F.max("rn")).cast("long").alias("rank2"),
        F.count(F.lit(1)).cast("long").alias("tcnt"),
    )
    per_gp = ranked.groupBy("cents", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    r2 = (
        per_gp.join(per_price, "cents")
        .groupBy("grp")
        .agg(
            F.sum(F.col("cnt") * F.col("rank2")).cast("long").alias("r2"),
            F.sum("cnt").cast("long").alias("n_g"),
        )
    )
    glob = per_price.agg(
        F.sum("tcnt").cast("long").alias("n"),
        F.sum(
            F.col("tcnt") * F.col("tcnt") * F.col("tcnt") - F.col("tcnt")
        ).cast("long").alias("tie_t"),
    )
    # H0 = 12/(n(n+1)) * sum_g (R_g^2 / n_g) - 3(n+1), R_g = r2/2;
    # corrected: H = H0 / (1 - tie_t / (n^3 - n)).
    # rsum is summed through an ORDER-PINNED left fold over the
    # group-sorted terms, not F.sum: H subtracts two ~equal large
    # doubles (catastrophic cancellation), so an unordered partial-agg
    # sum could flip the 4th decimal between engines/runs (session
    # code-review finding — the wave's own float contract).
    stat = r2.crossJoin(F.broadcast(glob)).selectExpr(
        "n",
        "tie_t",
        "grp",
        "cast(r2 AS double) * cast(r2 AS double)"
        " / (4.0D * cast(n_g AS double)) AS rterm",
    )
    return (
        stat.groupBy("n", "tie_t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.expr(
                "aggregate(transform(sort_array(collect_list("
                "struct(grp, rterm))), x -> x.rterm),"
                " 0.0D, (a, v) -> a + v)"
            ).alias("rsum"),
        )
        .selectExpr(
            "n",
            "n_groups",
            "tie_t",
            "round((12.0D / (cast(n AS double) * cast(n + 1 AS double))"
            " * rsum - 3.0D * cast(n + 1 AS double))"
            " / (1.0D - cast(tie_t AS double)"
            " / (cast(n AS double) * cast(n AS double) * cast(n AS double)"
            " - cast(n AS double))), 4) AS h",
            f"CASE WHEN round((12.0D / (cast(n AS double)"
            " * cast(n + 1 AS double)) * rsum"
            " - 3.0D * cast(n + 1 AS double))"
            " / (1.0D - cast(tie_t AS double)"
            " / (cast(n AS double) * cast(n AS double) * cast(n AS double)"
            f" - cast(n AS double))), 4) * 1000000D"
            f" > {_KW_CHI2_95_4DOF_PPM}D THEN 1L ELSE 0L END"
            " AS significant",
        )
    )


def _oracle_orders_kruskal_wallis() -> str:
    h_expr = """ROUND((12.0 / (n::DOUBLE * (n + 1)::DOUBLE) * rsum
             - 3.0 * (n + 1)::DOUBLE)
            / (1.0 - tie_t::DOUBLE
               / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)), 4)"""
    return f"""
WITH kw_o AS (
  SELECT o_orderpriority AS grp,
         ROUND(o_totalprice * 100)::BIGINT AS cents, o_orderkey
  FROM orders
),
kw_r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn FROM kw_o
),
kw_pp AS (
  SELECT cents, (MIN(rn) + MAX(rn))::BIGINT AS rank2,
         COUNT(*)::BIGINT AS tcnt
  FROM kw_r GROUP BY 1
),
kw_gp AS (
  SELECT cents, grp, COUNT(*)::BIGINT AS cnt FROM kw_r GROUP BY 1, 2
),
kw_r2 AS (
  SELECT grp, SUM(g.cnt * p.rank2)::BIGINT AS r2, SUM(g.cnt)::BIGINT AS n_g
  FROM kw_gp g JOIN kw_pp p USING (cents) GROUP BY 1
),
kw_gl AS (
  SELECT SUM(tcnt)::BIGINT AS n,
         SUM(tcnt * tcnt * tcnt - tcnt)::BIGINT AS tie_t
  FROM kw_pp
),
kw_s AS (
  SELECT n, tie_t, COUNT(*)::BIGINT AS n_groups,
         list_reduce(
             [0.0::DOUBLE]
             || list(r2::DOUBLE * r2::DOUBLE / (4.0 * n_g::DOUBLE)
                     ORDER BY grp),
             (a, v) -> a + v) AS rsum
  FROM kw_r2 CROSS JOIN kw_gl
  GROUP BY 1, 2
)
SELECT n, n_groups, tie_t,
       {h_expr} AS h,
       (CASE WHEN {h_expr} * 1000000
             > {_KW_CHI2_95_4DOF_PPM} THEN 1 ELSE 0 END)::BIGINT
         AS significant
FROM kw_s
"""


# ---------------------------------------------------------------------------
# multimodal_gif_roundtrip — hand-rolled LZW entropy coder, hash-checked
# ---------------------------------------------------------------------------


def q_multimodal_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-CHECKED entropy-coder round-trip: every document's UTF-8
    bytes LZW-compressed into a REAL indexed GIF89a
    (operators/multimodal.encode_gif — the LZW coder is HAND-ROLLED
    both directions, variable-width codes, 4096-entry dictionary with
    CLEAR resets; PNG's DEFLATE came from the stdlib, this one
    doesn't), then header-decoded AND fully LZW-decompressed. Every
    output has a CLOSED FORM in the source text — width=4,
    height=ceil(len/4), n_colors=256, n_bytes=height*4, and
    content_sum = the exact sum of the text's byte values (padding
    adds zeros) — so the DuckDB twin verifies the entire
    compress->frame->parse->decompress pipeline byte-exactly: a bug
    anywhere in the coder changes content_sum. Both stages map-only
    mapInPandas; the id join co-partitions."""
    from .operators.multimodal import (
        media_content_sum,
        media_decode_meta,
        media_from_documents_gif,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the two probe branches each contain the encode subtree and plans
    # are trees — without the persist every document is LZW-encoded
    # (and decoded) TWICE per run (session code-review finding)
    media = media_from_documents_gif(docs).persist()
    meta = media_decode_meta(media).select(
        "id",
        F.col("meta")["width"].cast("long").alias("width"),
        F.col("meta")["height"].cast("long").alias("height"),
        F.col("meta")["n_colors"].cast("long").alias("n_colors"),
    )
    sums = media_content_sum(media).select("id", "n_bytes", "content_sum")
    return meta.join(sums, "id").orderBy("id")


# content_sum must be the UTF-8 BYTE sum, not the codepoint sum, and
# the loop must run over CHARACTERS (len) while the geometry runs over
# BYTES (strlen) — indexing substr() with byte positions walks off the
# end of any multibyte document (session code-review finding, with a
# DuckDB repro on 'héllo'). Per-codepoint UTF-8 byte sums have a
# closed form: 1-byte c; 2-byte 0xC0+0x80 + (c>>6)+(c&63); 3-byte
# 0xE0+2*0x80 + (c>>12)+((c>>6)&63)+(c&63); 4-byte likewise.
_ORACLE_MULTIMODAL_GIF = """
SELECT doc_id AS id,
       4::BIGINT AS width,
       GREATEST(1, (strlen(text) + 3) // 4)::BIGINT AS height,
       256::BIGINT AS n_colors,
       (GREATEST(1, (strlen(text) + 3) // 4) * 4)::BIGINT AS n_bytes,
       COALESCE(list_sum(list_transform(range(1, len(text) + 1),
           i -> CASE
                WHEN ord(substr(text, i, 1)) < 128
                  THEN ord(substr(text, i, 1))
                WHEN ord(substr(text, i, 1)) < 2048
                  THEN 320 + (ord(substr(text, i, 1)) >> 6)
                       + (ord(substr(text, i, 1)) & 63)
                WHEN ord(substr(text, i, 1)) < 65536
                  THEN 480 + (ord(substr(text, i, 1)) >> 12)
                       + ((ord(substr(text, i, 1)) >> 6) & 63)
                       + (ord(substr(text, i, 1)) & 63)
                ELSE 624 + (ord(substr(text, i, 1)) >> 18)
                     + ((ord(substr(text, i, 1)) >> 12) & 63)
                     + ((ord(substr(text, i, 1)) >> 6) & 63)
                     + (ord(substr(text, i, 1)) & 63)
                END)), 0)::BIGINT AS content_sum
FROM documents
ORDER BY id
"""


WAVE7_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sketch_set_ops": q_sketch_set_ops,
    "graph_bfs_layers": q_graph_bfs_layers,
    "graph_kcore_peel": q_graph_kcore_peel,
    "dedup_winnowing": q_dedup_winnowing,
    "sim_binary_quant": q_sim_binary_quant,
    "customer_survival_km": q_customer_survival_km,
    "orders_theilsen_trend": q_orders_theilsen_trend,
    "orders_mann_whitney": q_orders_mann_whitney,
    "sim_mutual_nn": q_sim_mutual_nn,
    "dedup_cdc_chunks": q_dedup_cdc_chunks,
    "corpus_pmi_pairs": q_corpus_pmi_pairs,
    "customer_cohort_ltv": q_customer_cohort_ltv,
    "orders_kruskal_wallis": q_orders_kruskal_wallis,
    "multimodal_gif_roundtrip": q_multimodal_gif_roundtrip,
}

WAVE7_ORACLES: dict[str, str] = {
    "sketch_set_ops": _oracle_sketch_set_ops(),
    "graph_bfs_layers": _oracle_graph_bfs_layers(),
    "graph_kcore_peel": _oracle_graph_kcore_peel(),
    "dedup_winnowing": _oracle_dedup_winnowing(),
    "sim_binary_quant": _oracle_sim_binary_quant(),
    "customer_survival_km": _oracle_customer_survival_km(),
    "orders_theilsen_trend": _oracle_orders_theilsen_trend(),
    "orders_mann_whitney": _oracle_orders_mann_whitney(),
    "sim_mutual_nn": _oracle_sim_mutual_nn(),
    "dedup_cdc_chunks": _oracle_dedup_cdc_chunks(),
    "corpus_pmi_pairs": _oracle_corpus_pmi_pairs(),
    "customer_cohort_ltv": _ORACLE_CUSTOMER_COHORT_LTV,
    "orders_kruskal_wallis": _oracle_orders_kruskal_wallis(),
    "multimodal_gif_roundtrip": _ORACLE_MULTIMODAL_GIF,
}
