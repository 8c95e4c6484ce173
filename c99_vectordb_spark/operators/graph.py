"""Iterative graph algorithms over DataFrame edge lists.

PageRank is the canonical iterative-join workload (the other one in
this repo is connected components, operators/dedup.py:427): per
iteration, one join of the rank table against the edge list on src and
one aggregation by dst. The loop lives on the DRIVER (plan
composition), never the data: no collect() in the iteration body.

Fixed-point integer arithmetic (ranks scaled by SCALE, damping as a
rational num/den) keeps every value BIGINT, so the DuckDB oracle —
the same algebra unrolled into k CTE stages — hash-matches exactly.
Floating-point PageRank would diverge across engines in the last ulp
because parallel SUM order is nondeterministic; integer SUM is
order-free.

Scale notes (1000-executor / 100 TB):
- The edge list is the big table; it is hash-partitioned by src ONCE
  (repartition before persist) and every iteration's join reuses that
  partitioning — rank tables are node-sized, orders of magnitude
  smaller, and shuffle to meet the edges.
- k iterations = k joins + k partial-aggregated shuffles; lineage
  grows linearly, so for k beyond ~10 insert a localCheckpoint every
  few iterations (same policy as dedup's pointer-jumping loop).
- Dangling nodes (no out-edges) simply contribute no mass — the
  simplified no-redistribution variant, stated in the contract so the
  oracle matches; full dangling-mass redistribution would add one
  scalar aggregate per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list (src, dst).

    r0(v) = SCALE; per iteration:
      contrib(u) = r(u) DIV outdeg(u)                (integer floor div)
      r'(v) = (1-d)*SCALE + (num * SUM contrib) DIV den
    Returns (node, pr_fp) for every node appearing as src or dst.
    """
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # partition the big side once; every iteration's join reuses it
    ej = e.join(outdeg, "src").repartition("src").persist()
    base = (damping_den - damping_num) * PR_SCALE // damping_den
    ranks = nodes.withColumn("pr_fp", F.lit(PR_SCALE).cast("long"))
    for _ in range(iters):
        contrib = (
            ej.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select(
                "dst",
                # integer DIV, not floor(double /): exact at any rank
                # magnitude (a double quotient loses ulps past 2^53)
                F.expr("pr_fp DIV outdeg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("insum"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"(coalesce(insum, 0L) * {damping_num}) DIV {damping_den}"
                    )
                ).alias("pr_fp"),
            )
        )
    return ranks


def duckdb_pagerank_sql(
    edges_cte: str,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """Stage-unrolled DuckDB twin of :func:`pagerank`: k CTE rounds of
    the identical integer algebra. ``edges_cte`` must define a
    relation ``edges(src, dst)``."""
    base = (damping_den - damping_num) * PR_SCALE // damping_den
    parts = [
        f"""WITH {edges_cte},
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
outdeg AS MATERIALIZED (
  SELECT src, COUNT(*)::BIGINT AS outdeg FROM edges GROUP BY src
),
ej AS MATERIALIZED (
  SELECT e.src, e.dst, o.outdeg FROM edges e JOIN outdeg o USING (src)
),
r0 AS MATERIALIZED (SELECT node, {PR_SCALE}::BIGINT AS pr_fp FROM nodes)"""
    ]
    for t in range(1, iters + 1):
        prev = f"r{t - 1}"
        parts.append(
            f""",
c{t} AS MATERIALIZED (
  SELECT ej.dst, SUM(r.pr_fp // ej.outdeg)::BIGINT AS insum
  FROM ej JOIN {prev} r ON r.node = ej.src
  GROUP BY ej.dst
),
r{t} AS MATERIALIZED (
  SELECT n.node,
         ({base}::BIGINT
          + (COALESCE(c.insum, 0) * {damping_num}) // {damping_den}
         )::BIGINT AS pr_fp
  FROM nodes n LEFT JOIN c{t} c ON c.dst = n.node
)"""
        )
    parts.append(f"\nSELECT node, pr_fp FROM r{iters}")
    return "".join(parts)


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), deterministic: each round every node adopts the MODE of
    its neighbors' labels plus its own (the self-vote damps the
    bipartite oscillation the raw algorithm exhibits), ties broken by
    smallest label. Labels start as node ids, so the result after a
    fixed round count is a pure function of the edge set — both
    engines replay it exactly (the DuckDB twin unrolls the rounds).

    Scale shape: per round ONE edge-labels equi-join + one
    (node, label)-keyed count + one PARTITIONED mode window — the same
    partition-once honest iterative-join shape as pagerank; the loop
    composes on the driver with no collect() in the body. Returns
    (node, label)."""
    from pyspark.sql import Window

    # symmetrize + dedup ONCE, partition by the join key, and reuse
    # across every round (pagerank's partition-once discipline — the
    # lazy plan would otherwise recompute the distinct per round)
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition("dst")
        .persist()
    )
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(iters):
        votes = und.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        votes = votes.unionByName(labels.select("node", "label"))
        cnt = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels


def duckdb_label_propagation_sql(edges_cte: str, iters: int = 3) -> str:
    """DuckDB twin of :func:`label_propagation`: the identical rounds
    unrolled into CTEs. ``edges_cte`` must define ``edges(src, dst)``.
    Produces a relation ``lp_l{iters}(node, label)``."""
    parts = [
        f"""{edges_cte},
lp_und AS (
  SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges
),
lp_l0 AS (SELECT DISTINCT src AS node, src AS label FROM lp_und)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
lp_v{t} AS (
  SELECT u.src AS node, l.label FROM lp_und u
  JOIN lp_l{t - 1} l ON u.dst = l.node
  UNION ALL SELECT node, label FROM lp_l{t - 1}
),
lp_c{t} AS (
  SELECT node, label, COUNT(*) AS cnt FROM lp_v{t} GROUP BY 1, 2
),
lp_l{t} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label) AS rn
    FROM lp_c{t}
  ) WHERE rn = 1
)"""
        )
    return "".join(parts)
