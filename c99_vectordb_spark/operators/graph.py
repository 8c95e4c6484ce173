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
    # persist the node set: it re-enters the plan every iteration
    # (the rank-update left join), and without the persist each
    # iteration re-runs the union+distinct over the FULL edge list —
    # at 100 TB that is iters extra edge-table shuffles for a
    # node-sized relation (round-7 fix; warm sf0.1 time 2.07 -> 1.88s)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
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


def bfs_layers(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """Multi-source breadth-first search over an undirected edge list:
    every node in ``seeds(node)`` is layer 0; layer t is the set of
    nodes first reached after exactly t hops. Returns
    ``(node, layer)`` for every node reached within ``rounds`` hops.

    The frontier-expansion loop is the textbook distributed BFS: per
    round ONE frontier-edges equi-join, one distinct, and one
    left-anti join against the visited set — the loop composes plans
    on the driver, no collect() in the body. The adjacency list is
    symmetrized + deduped ONCE, partitioned by the join key, and
    reused every round (pagerank's partition-once discipline); the
    visited set is persisted per round so round t+1's anti-join does
    not recompute rounds 1..t. Layer membership after a fixed round
    count is a pure function of the edge set, so the DuckDB twin
    (:func:`duckdb_bfs_layers_sql`) unrolls the identical rounds."""
    adj = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition("src")
        .persist()
    )
    # seeds outside the graph carry no edges and would distort layer 0:
    # keep the documented contract "layer 0 = seed nodes present in the
    # edge set" (the oracle twin applies the same semi-join)
    # visited is referenced TWICE per round (the anti-join and the
    # union), so a lazy plan doubles per round — 2^rounds copies of
    # the edge subtree by round 4 (plan-audit: 1399 shuffles in ONE
    # query plan). localCheckpoint truncates the lineage each round
    # (the pre_range discipline), keeping the plan linear in rounds;
    # the checkpointed frame is node-sized.
    visited = (
        # dedup the seed set: the DuckDB twin's bfs_v0 is DISTINCT, and
        # a caller-supplied duplicate seed would otherwise yield
        # duplicate layer-0 rows through the semi-join
        seeds.select("node")
        .distinct()
        .join(adj.select(F.col("src").alias("node")).distinct(), "node", "semi")
        .withColumn("layer", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for t in range(1, rounds + 1):
        frontier = (
            frontier.join(adj, frontier.node == adj.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("layer", F.lit(t).cast("long"))
        )
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return visited


def duckdb_bfs_layers_sql(edges_cte: str, rounds: int = 4) -> str:
    """DuckDB twin of :func:`bfs_layers`: the identical frontier
    rounds unrolled into CTEs. ``edges_cte`` must define relations
    ``edges(src, dst)`` and ``seeds(node)``. Produces a relation
    ``bfs_all(node, layer)`` with every node reached in <= rounds
    hops."""
    parts = [
        f"""{edges_cte},
bfs_adj AS MATERIALIZED (
  SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges
),
bfs_v0 AS (
  SELECT DISTINCT s.node, 0::BIGINT AS layer FROM seeds s
  WHERE s.node IN (SELECT src FROM bfs_adj)
)"""
    ]
    union = ["SELECT node, layer FROM bfs_v0"]
    for t in range(1, rounds + 1):
        prev_union = " UNION ALL ".join(union)
        parts.append(
            f""",
bfs_v{t} AS MATERIALIZED (
  SELECT DISTINCT a.dst AS node, {t}::BIGINT AS layer
  FROM bfs_adj a JOIN bfs_v{t - 1} f ON a.src = f.node
  WHERE a.dst NOT IN (SELECT node FROM ({prev_union}))
)"""
        )
        union.append(f"SELECT node, layer FROM bfs_v{t}")
    parts.append(f""",
bfs_all AS ({" UNION ALL ".join(union)})""")
    return "".join(parts)


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 5) -> DataFrame:
    """Bounded-round k-core peeling over an undirected edge list: each
    round drops every node whose current degree is below ``k`` (and
    the edges touching it), the classic iterated-filter approximation
    that converges to the exact k-core once a round removes nothing.
    Returns one row per round: ``(round, nodes_remaining,
    edges_remaining, min_degree)`` — min_degree reaching ``k`` is the
    convergence certificate, making the peel schedule itself the
    report.

    Scale shape: per round one degree aggregation + two semi-joins of
    the edge list against the (node-sized) survivor set; the round
    summaries are 1-row aggregates unioned at the end, so the loop
    composes one driver-side plan with no collect() in the body.
    Fixed rounds keep the DuckDB twin (:func:`duckdb_kcore_peel_sql`)
    a finite CTE unroll of the identical algebra."""
    adj = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition("src")
        .persist()
    )
    summaries = []
    cur = adj
    for t in range(1, rounds + 1):
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        # cur is referenced THREE times per round (the degree filter
        # and both endpoint semi-joins), so a lazy plan triples per
        # round — 3^rounds copies of the edge subtree by round 5
        # (plan-audit: 2904 shuffles in ONE query plan).
        # localCheckpoint truncates the lineage each round; the
        # checkpointed frame is the (shrinking) edge set.
        cur = (
            cur.join(keep, "src", "semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "semi")
            .localCheckpoint(eager=True)
        )
        deg_after = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        summaries.append(
            deg_after.agg(
                F.lit(t).cast("long").alias("round"),
                F.count(F.lit(1)).cast("long").alias("nodes_remaining"),
                # integer DIV (the symmetric degree sum is even by
                # construction); a double quotient would lose ulps
                # past 2^53 at real edge counts
                F.expr("coalesce(sum(deg), 0L) div 2").alias("edges_remaining"),
                F.coalesce(F.min("deg"), F.lit(0)).cast("long").alias(
                    "min_degree"
                ),
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out


def duckdb_kcore_peel_sql(edges_cte: str, k: int = 3, rounds: int = 5) -> str:
    """DuckDB twin of :func:`kcore_peel`: the identical peel rounds
    unrolled into CTEs. ``edges_cte`` must define ``edges(src, dst)``.
    Produces a relation ``kc_report(round, nodes_remaining,
    edges_remaining, min_degree)``."""
    parts = [
        f"""{edges_cte},
kc_a0 AS MATERIALIZED (
  SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges
)"""
    ]
    selects = []
    for t in range(1, rounds + 1):
        parts.append(
            f""",
kc_k{t} AS (
  SELECT src FROM kc_a{t - 1} GROUP BY src HAVING COUNT(*) >= {k}
),
kc_a{t} AS MATERIALIZED (
  SELECT a.src, a.dst FROM kc_a{t - 1} a
  WHERE a.src IN (SELECT src FROM kc_k{t})
    AND a.dst IN (SELECT src FROM kc_k{t})
),
kc_s{t} AS (
  SELECT {t}::BIGINT AS round,
         COUNT(*)::BIGINT AS nodes_remaining,
         (COALESCE(SUM(deg), 0) // 2)::BIGINT AS edges_remaining,
         COALESCE(MIN(deg), 0)::BIGINT AS min_degree
  FROM (SELECT src, COUNT(*)::BIGINT AS deg FROM kc_a{t} GROUP BY src)
)"""
        )
        selects.append(f"SELECT * FROM kc_s{t}")
    parts.append(f""",
kc_report AS ({" UNION ALL ".join(selects)})""")
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
            # labels is referenced TWICE per round (neighbor votes +
            # the self-vote union), so a lazy plan doubles per round —
            # 2^iters copies of the label subtree by the end (the same
            # lineage blowup fixed in bfs_layers/kcore_peel).
            # localCheckpoint truncates it; the frame is node-sized.
            .localCheckpoint(eager=True)
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


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 6,
) -> DataFrame:
    """Multi-source weighted shortest paths, Bellman-Ford relaxation
    bounded to ``rounds`` edges per path: returns ``(node, dist)``
    where dist is the EXACT minimum path weight over all paths of at
    most ``rounds`` hops from any seed (seeds are dist 0). Weights are
    positive BIGINTs, so every quantity is integer and the relation is
    a pure function of (edge set, seed set, rounds) — the DuckDB twin
    (:func:`duckdb_sssp_sql`) unrolls the identical relaxations.

    The bounded-round contract is the same one bfs_layers/kcore_peel
    publish: a fixed distributed-round budget with the convergence
    question answered IN the output (callers can compare round counts
    or look at the unreached census) rather than an unbounded loop.
    Per round: ONE adjacency-frontier equi-join producing candidate
    relaxations and one min-aggregation over the node-sized distance
    table; the adjacency is symmetrized + deduped once, partitioned by
    the join key, and reused (pagerank's discipline). localCheckpoint
    truncates the per-round lineage, keeping plans linear in rounds.
    Nothing collects; the distance table is node-sized forever.
    """
    adj = (
        edges.select("src", "dst", "w")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        # parallel edges keep their MIN weight (relaxation only ever
        # uses the cheapest parallel edge; the twin mirrors this)
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition("src")
        .persist()
    )
    dist = (
        seeds.select("node")
        .distinct()
        .join(adj.select(F.col("src").alias("node")).distinct(), "node", "semi")
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    # delta relaxation (bfs_layers' changed-only frontier discipline):
    # only nodes whose distance IMPROVED last round can improve a
    # neighbor this round, so the per-round join input is the frontier,
    # not the whole settled table — nodes fixed in round 1 stop
    # re-generating their edge fan-out in rounds 2..R. The result
    # relation is identical to relaxing everything (min is idempotent
    # over already-settled candidates); the oracle twin keeps the
    # naive full-table unroll, so the hash match proves it.
    frontier = dist
    for _ in range(rounds):
        # an empty frontier generates no candidates and can never
        # refill — the remaining rounds are provably no-ops
        if frontier.limit(1).count() == 0:
            break
        cand = (
            adj.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).cast("long").alias("dist"),
            )
        )
        new = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = (
            new.join(
                dist.selectExpr("node", "dist AS old_dist"), "node", "left"
            )
            .filter(F.col("old_dist").isNull() | (F.col("dist") < F.col("old_dist")))
            .select("node", "dist")
            .localCheckpoint(eager=True)
        )
        dist = new
    return dist


def duckdb_sssp_sql(edges_cte: str, rounds: int = 6) -> str:
    """DuckDB twin of :func:`sssp_bounded`: the identical Bellman-Ford
    relaxations unrolled into CTEs. ``edges_cte`` must define
    relations ``edges(src, dst, w)`` and ``seeds(node)``. Produces
    ``sp_all(node, dist)``."""
    parts = [
        f"""{edges_cte},
sp_adj AS MATERIALIZED (
  SELECT src, dst, MIN(w) AS w FROM (
    SELECT src, dst, w FROM edges
    UNION ALL SELECT dst AS src, src AS dst, w FROM edges
  ) GROUP BY 1, 2
),
sp_d0 AS (
  SELECT DISTINCT s.node, 0::BIGINT AS dist FROM seeds s
  WHERE s.node IN (SELECT src FROM sp_adj)
)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
sp_d{t} AS MATERIALIZED (
  SELECT node, MIN(dist)::BIGINT AS dist FROM (
    SELECT node, dist FROM sp_d{t - 1}
    UNION ALL
    SELECT a.dst AS node, f.dist + a.w AS dist
    FROM sp_adj a JOIN sp_d{t - 1} f ON a.src = f.node
  ) GROUP BY node
)"""
        )
    parts.append(f""",
sp_all AS (SELECT node, dist FROM sp_d{rounds})""")
    return "".join(parts)
