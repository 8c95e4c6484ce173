"""Hypothesis property tests for the session-7 primitives — laws on
ARBITRARY inputs the parquet fixtures cannot explore (adversarial
byte streams through the LZW coder, random graphs for BFS/k-core,
random multisets for the integer rank algebra). Pure Python, no
Spark session: fast enough for wide example counts.
"""
from __future__ import annotations

import collections
import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from c99_vectordb_spark.operators.multimodal import (
    _lzw_decode_gif,
    _lzw_encode_gif,
    decode_gif,
    encode_gif,
)

# ---------------------------------------------------------------------------
# LZW / GIF codec: the identity law on arbitrary byte streams
# ---------------------------------------------------------------------------


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=200, deadline=None)
def test_lzw_roundtrip_identity(data):
    if data:
        assert _lzw_decode_gif(_lzw_encode_gif(data), 8) == data


@given(st.binary(min_size=0, max_size=2000))
@settings(max_examples=100, deadline=None)
def test_gif_container_roundtrip(data):
    dec, meta = decode_gif(encode_gif(data))
    w, h = meta["width"], meta["height"]
    assert dec == data + b"\x00" * (w * h - len(data))
    assert w * h >= len(data)
    # Minimal padding: at most one row, except the degenerate empty payload
    # which still needs a nonzero canvas (GIF dimensions must be >= 1).
    assert w * h - len(data) < w or not data


@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=1, max_value=30000),
)
@settings(max_examples=30, deadline=None)
def test_lzw_constant_runs(byte, n):
    """Degenerate single-symbol runs of any length: the KwKwK case at
    every dictionary size, across width boundaries and resets."""
    data = bytes([byte]) * n
    assert _lzw_decode_gif(_lzw_encode_gif(data), 8) == data


# ---------------------------------------------------------------------------
# BFS / k-core: replay laws on random graphs
# ---------------------------------------------------------------------------


@st.composite
def _graphs(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    edges = draw(
        st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ).filter(lambda t: t[0] != t[1]),
            min_size=1,
            max_size=60,
        )
    )
    return edges


def _adj(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return adj


@given(_graphs(), st.integers(min_value=1, max_value=4))
@settings(max_examples=150, deadline=None)
def test_bfs_layers_are_shortest_paths(edges, rounds):
    """The frontier-expansion loop's layer assignment IS the shortest
    hop distance — the law the Spark loop and the unrolled CTE twin
    both implement."""
    adj = _adj(edges)
    seeds = {min(adj)}
    layer_of = {n: 0 for n in seeds}
    frontier = set(seeds)
    for t in range(1, rounds + 1):
        frontier = {m for x in frontier for m in adj[x] if m not in layer_of}
        for m in frontier:
            layer_of[m] = t
    # independent Dijkstra-ish truth
    import heapq

    dist = {min(adj): 0}
    pq = [(0, min(adj))]
    while pq:
        d, x = heapq.heappop(pq)
        if d > dist.get(x, 1 << 30):
            continue
        for m in adj[x]:
            if d + 1 < dist.get(m, 1 << 30):
                dist[m] = d + 1
                heapq.heappush(pq, (d + 1, m))
    for node, layer in layer_of.items():
        assert dist[node] == layer
    for node, d in dist.items():
        if d <= rounds:
            assert layer_of[node] == d


@given(_graphs(), st.integers(min_value=1, max_value=4))
@settings(max_examples=150, deadline=None)
def test_kcore_peel_fixpoint_is_kcore(edges, k):
    """Once a peel round removes nothing, the survivor set IS the
    k-core: the maximal subgraph with min degree >= k (convergence
    certificate law)."""
    adj = {n: set(ms) for n, ms in _adj(edges).items()}
    while True:
        keep = {n for n, ms in adj.items() if len(ms) >= k}
        nxt = {
            n: {m for m in ms if m in keep} for n, ms in adj.items() if n in keep
        }
        nxt = {n: ms for n, ms in nxt.items() if ms}
        if nxt == adj:
            break
        adj = nxt
    # fixpoint: every surviving node has degree >= k
    for n, ms in adj.items():
        assert len(ms) >= k
    # maximality: re-adding any removed node cannot satisfy k within
    # the survivor set (its surviving-neighbor count is < k) — checked
    # against the original graph
    orig = _adj(edges)
    for n in set(orig) - set(adj):
        assert len(orig[n] & set(adj)) < k or not adj


# ---------------------------------------------------------------------------
# KMV set algebra: estimator laws on random sets
# ---------------------------------------------------------------------------


def _md5_56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


@given(
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=400),
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=400),
)
@settings(max_examples=100, deadline=None)
def test_kmv_union_sketch_is_sketch_of_union(a, b):
    """THE mergeable-sketch law: bottom-k of the merged sketches ==
    bottom-k of the union's own sketch — union estimates computed
    from per-set sketches are exactly what a direct sketch of the
    union would give."""
    k = 64
    ha = sorted(_md5_56(f"kmv:{x}") for x in a)[:k]
    hb = sorted(_md5_56(f"kmv:{x}") for x in b)[:k]
    merged = sorted(set(ha) | set(hb))[:k]
    truth = sorted(_md5_56(f"kmv:{x}") for x in a | b)[:k]
    assert merged == truth


@given(
    st.sets(st.integers(min_value=0, max_value=100_000), min_size=200, max_size=800)
)
@settings(max_examples=50, deadline=None)
def test_kmv_estimate_within_statistical_bounds(s):
    """k=64 gives ~1/sqrt(k-2) ~ 13% relative standard error; assert a
    generous 5-sigma envelope so the law (not luck) is what's tested."""
    k = 64
    sk = sorted(_md5_56(f"kmv:{x}") for x in s)[:k]
    est = (k - 1) * (1 << 56) // sk[k - 1]
    assert abs(est - len(s)) <= max(10, int(0.65 * len(s)))


# ---------------------------------------------------------------------------
# doubled-rank algebra (Mann-Whitney / Kruskal-Wallis)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # group
            st.integers(min_value=-50, max_value=50),  # value (ties likely)
        ),
        min_size=2,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_doubled_rank_sums_are_exact_and_conserve(rows):
    """rank2 = min(rn) + max(rn) per tie run equals twice the average
    rank; summed over all rows it must equal n(n+1) exactly (rank
    conservation), and per-group doubled U statistics satisfy
    2U_g + 2U_rest = 2 n_g (n - n_g)."""
    vals = sorted(range(len(rows)), key=lambda i: (rows[i][1], i))
    rn = {i: p + 1 for p, i in enumerate(vals)}
    by_val = collections.defaultdict(list)
    for i, (_, v) in enumerate(rows):
        by_val[v].append(rn[i])
    rank2 = {v: min(rns) + max(rns) for v, rns in by_val.items()}
    n = len(rows)
    total2 = sum(rank2[v] for _, v in rows)
    assert total2 == n * (n + 1)
    groups = {g for g, _ in rows}
    for g in groups:
        r2_g = sum(rank2[v] for gg, v in rows if gg == g)
        n_g = sum(1 for gg, _ in rows if gg == g)
        u2_g = r2_g - n_g * (n_g + 1)
        r2_rest = total2 - r2_g
        n_rest = n - n_g
        u2_rest = r2_rest - n_rest * (n_rest + 1)
        assert u2_g + u2_rest == 2 * n_g * n_rest
        assert 0 <= u2_g <= 2 * n_g * n_rest
