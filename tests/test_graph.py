"""Fixed-point PageRank semantics (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from c99_vectordb_spark.operators.graph import PR_SCALE, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_hand_checked(spark):
    """3-node cycle with one branch: 1->{2,3}, 2->3, 3->1; two
    iterations derived by hand with SCALE=1e6, d=85/100."""
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 1)])
    r = {row.node: row.pr_fp for row in pagerank(e, iters=2).collect()}
    assert r == {1: 1361250, 2: 575000, 3: 1063750}


def test_pagerank_mass_bounds_and_dangling(spark):
    """Dangling node 4 (no out-edges): keeps receiving mass, leaks its
    own — total mass stays within [n*base, n*SCALE]."""
    e = _edges(spark, [(1, 4), (2, 4), (3, 4), (4, 4)][:3] + [(3, 1)])
    out = pagerank(e, iters=4).collect()
    n = len(out)
    total = sum(r.pr_fp for r in out)
    assert n == 4
    assert n * 150000 <= total <= n * PR_SCALE
    # the pure sink has the largest rank; a pure source decays to base+
    r = {row.node: row.pr_fp for row in out}
    assert r[4] == max(r.values())
    assert r[2] == 150000  # no in-edges after iter 1


def test_pagerank_uniform_on_symmetric_cycle(spark):
    """On a directed cycle every node keeps exactly the same rank —
    and with outdeg 1 the fixed point is SCALE itself (no floor loss)."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    ranks = {r.node: r.pr_fp for r in pagerank(e, iters=5).collect()}
    assert set(ranks.values()) == {PR_SCALE}
