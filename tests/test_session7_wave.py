"""Property tests for the round-6 session-7 operator wave: KMV set
algebra, BFS layers, k-core peeling, winnowing fingerprints, binary
sign quantization, Kaplan-Meier survival, Theil-Sen trend,
Mann-Whitney rank-sum.

Oracle parity (tools/verify_oracle) proves Spark==DuckDB; these prove
the SEMANTICS on axes a twin bug could share — every graph round
replayed against a pure-Python BFS/peel, the KMV estimate replayed
from Python md5 bottom-k, the winnowing coverage guarantee on a
constructed near-dup pair, Hamming/rerank recounted in numpy, the KM
curve's risk-set and monotonicity laws plus a full integer-recurrence
replay, Theil-Sen recounted slope-by-slope, and Mann-Whitney checked
against pandas average ranks with the tie-corrected z.
"""
from __future__ import annotations

import collections
import hashlib
import re

import numpy as np
import pandas as pd

from c99_vectordb_spark.queries_wave7 import (
    _BQ_K,
    _BQ_N_QUERIES,
    _BQ_SHORTLIST,
    _KCORE_K,
    _KCORE_ROUNDS,
    _KM_BUCKET_DAYS,
    _KM_CHURN_GAP_DAYS,
    _KMV_SET_K,
    _TRADE_MIN_ORDERS,
    _U56,
    _WIN_JACC_PPM,
    _WIN_KGRAM,
    _WIN_MAX_FREQ,
    _WIN_WINDOW,
    q_customer_survival_km,
    q_dedup_winnowing,
    q_graph_bfs_layers,
    q_graph_kcore_peel,
    q_orders_mann_whitney,
    q_orders_theilsen_trend,
    q_sim_binary_quant,
    q_sketch_set_ops,
    winnow_fingerprints,
)


def _md5_56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _trade_adj(sf_dir: str) -> dict[int, set[int]]:
    """The thresholded repeat-trade graph, replayed in pandas."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    n_ord = j.groupby(["o_custkey", "l_suppkey"])["l_orderkey"].nunique()
    adj: dict[int, set[int]] = collections.defaultdict(set)
    for (c, s), n in n_ord.items():
        if n >= _TRADE_MIN_ORDERS:
            a, b = 2 * int(c), 2 * int(s) + 1
            adj[a].add(b)
            adj[b].add(a)
    return adj


# ---------------------------------------------------------------------------
# graph_bfs_layers
# ---------------------------------------------------------------------------

def test_bfs_layers_replay_pure_python(spark, sf_dir):
    adj = _trade_adj(sf_dir)
    seeds = {2 * s + 1 for s in range(5)} & set(adj)
    layer_of = {n: 0 for n in seeds}
    frontier = set(seeds)
    for t in range(1, 5):
        frontier = {
            m for n in frontier for m in adj[n] if m not in layer_of
        }
        for m in frontier:
            layer_of[m] = t
    census = collections.Counter(layer_of.values())
    rows = {r["layer"]: r for r in q_graph_bfs_layers(spark, sf_dir).collect()}
    # a layer that added no nodes has no census row (groupBy semantics);
    # the unreached row (-1) is always present
    assert set(rows) == set(census) | {-1}
    for t in census:
        nodes = [n for n, l_ in layer_of.items() if l_ == t]
        assert rows[t]["n_nodes"] == census[t]
        assert rows[t]["min_node"] == min(nodes)
        assert rows[t]["max_node"] == max(nodes)
    unreached = set(adj) - set(layer_of)
    assert rows[-1]["n_nodes"] == len(unreached)
    # layers partition the reached set and every node is in the graph
    assert sum(census.values()) + len(unreached) == len(adj)


# ---------------------------------------------------------------------------
# graph_kcore_peel
# ---------------------------------------------------------------------------

def test_kcore_peel_replay_pure_python(spark, sf_dir):
    adj = {n: set(ms) for n, ms in _trade_adj(sf_dir).items()}
    rows = {r["round"]: r for r in q_graph_kcore_peel(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, _KCORE_ROUNDS + 1))
    for t in range(1, _KCORE_ROUNDS + 1):
        keep = {n for n, ms in adj.items() if len(ms) >= _KCORE_K}
        adj = {
            n: {m for m in ms if m in keep}
            for n, ms in adj.items()
            if n in keep
        }
        adj = {n: ms for n, ms in adj.items() if ms}
        n_edges = sum(len(ms) for ms in adj.values()) // 2
        mindeg = min((len(ms) for ms in adj.values()), default=0)
        assert rows[t]["nodes_remaining"] == len(adj), t
        assert rows[t]["edges_remaining"] == n_edges, t
        assert rows[t]["min_degree"] == mindeg, t
    # peeling is monotone: node/edge counts never increase
    seq = [rows[t]["nodes_remaining"] for t in range(1, _KCORE_ROUNDS + 1)]
    assert seq == sorted(seq, reverse=True)


# ---------------------------------------------------------------------------
# sketch_set_ops
# ---------------------------------------------------------------------------

def test_kmv_setops_replay_python_md5(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    sets = {
        p: set(g["o_custkey"])
        for p, g in orders.groupby("o_orderpriority")
    }
    sk = {
        p: sorted(_md5_56(f"kmv:{c}") for c in cs)[:_KMV_SET_K]
        for p, cs in sets.items()
    }
    rows = q_sketch_set_ops(spark, sf_dir).collect()
    assert len(rows) == len(sets) * (len(sets) - 1) // 2
    k = _KMV_SET_K
    for r in rows:
        a, b = r["type_a"], r["type_b"]
        assert a < b
        # exact columns recount from the raw sets
        inter = len(sets[a] & sets[b])
        assert r["exact_inter"] == inter
        assert r["exact_union"] == len(sets[a] | sets[b])
        # KMV estimates replay from Python md5 bottom-k
        assert r["est_a"] == (k - 1) * _U56 // sk[a][k - 1]
        assert r["est_b"] == (k - 1) * _U56 // sk[b][k - 1]
        u = sorted(set(sk[a]) | set(sk[b]))[:k]
        assert r["est_union"] == (k - 1) * _U56 // u[k - 1]
        inter_k = len([x for x in u if x in set(sk[a]) and x in set(sk[b])])
        assert r["jaccard_est_ppm"] == 1_000_000 * inter_k // k
        # the estimator is actually estimating: within 50% of truth on
        # these ~100+-element sets (k=64 gives ~12% relative error)
        assert abs(r["est_union"] - r["exact_union"]) <= r["exact_union"] // 2


# ---------------------------------------------------------------------------
# dedup_winnowing
# ---------------------------------------------------------------------------

def _py_winnow(text: str) -> set[int]:
    t = re.sub(r"\s+", " ", text).strip().lower()
    if len(t) < _WIN_KGRAM + _WIN_WINDOW - 1:
        return set()
    grams = [
        _md5_56(t[i : i + _WIN_KGRAM])
        for i in range(len(t) - _WIN_KGRAM + 1)
    ]
    return {
        min(grams[p - _WIN_WINDOW : p])
        for p in range(_WIN_WINDOW, len(grams) + 1)
    }


def test_winnowing_coverage_guarantee_constructed(spark):
    # the MOSS guarantee: two docs sharing a substring of length
    # >= kg + w - 1 share at least one fingerprint
    shared = "the quick brown fox jumps over the lazy dog today"
    assert len(shared) >= _WIN_KGRAM + _WIN_WINDOW - 1
    docs = spark.createDataFrame(
        [
            (1, "AAAA unrelated prefix text " + shared + " tail one"),
            (2, "completely different opening " + shared + " other end"),
            (3, "no overlap with anything else at all in this row"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = collections.defaultdict(set)
    for r in fps:
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared span must share a fingerprint"
    # and the Spark fingerprints equal the pure-Python winnow
    rows = docs.collect()
    for r in rows:
        assert by_doc[r["doc_id"]] == _py_winnow(r["text"]), r["doc_id"]


def test_winnowing_pairs_recount(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    fps = {r.doc_id: _py_winnow(r.text) for r in docs.itertuples()}
    df = collections.Counter(f for s in fps.values() for f in s)
    kept = {d: {f for f in s if df[f] <= _WIN_MAX_FREQ} for d, s in fps.items()}
    want = {}
    ids = sorted(kept)
    inv = collections.defaultdict(set)
    for d, s in kept.items():
        for f in s:
            inv[f].add(d)
    shared = collections.Counter()
    for f, ds in inv.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    for (a, b), sh in shared.items():
        jppm = 1_000_000 * sh // (len(kept[a]) + len(kept[b]) - sh)
        if jppm >= _WIN_JACC_PPM:
            want[(a, b)] = (sh, jppm)
    got = {
        (r["doc_a"], r["doc_b"]): (r["shared_fps"], r["jaccard_ppm"])
        for r in q_dedup_winnowing(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "sf data should contain planted near-dup pairs"


# ---------------------------------------------------------------------------
# sim_binary_quant
# ---------------------------------------------------------------------------

def test_binary_quant_recount_numpy(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    codes = {
        i: tuple(1 if x > 0 else 0 for x in v[:64]) for i, v in vecs.items()
    }
    rows = q_sim_binary_quant(spark, sf_dir).collect()
    by_q = collections.defaultdict(list)
    for r in rows:
        by_q[r["qid"]].append(r)
    assert set(by_q) == set(range(_BQ_N_QUERIES))
    for qid, rs in by_q.items():
        assert len(rs) == _BQ_K
        qc = codes[qid]
        ham = {
            i: sum(a != b for a, b in zip(qc, c))
            for i, c in codes.items()
            if i != qid
        }
        cos = {
            i: round(
                float(
                    vecs[i] @ vecs[qid]
                    / (np.sqrt(vecs[i] @ vecs[i]) * np.sqrt(vecs[qid] @ vecs[qid]))
                ),
                4,
            )
            for i in ham
        }
        short = sorted(ham, key=lambda i: (ham[i], i))[:_BQ_SHORTLIST]
        rerank = sorted(short, key=lambda i: (-cos[i], i))[:_BQ_K]
        exact5 = set(sorted(cos, key=lambda i: (-cos[i], i))[:_BQ_K])
        for rank, i in enumerate(rerank, 1):
            row = rs[rank - 1]
            assert (row["id"], row["rank"]) == (i, rank)
            assert row["hamming"] == ham[i]
            assert abs(row["cos"] - cos[i]) < 5e-5
            assert row["in_exact_top5"] == (1 if i in exact5 else 0)


# ---------------------------------------------------------------------------
# customer_survival_km
# ---------------------------------------------------------------------------

def test_km_replay_and_laws(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    g = orders.groupby("o_custkey")["o_orderdate"]
    f, l_ = g.min(), g.max()
    max_d = orders["o_orderdate"].max()
    t = ((l_ - f).dt.days // _KM_BUCKET_DAYS).astype(int)
    ev = (l_ < max_d - pd.Timedelta(days=_KM_CHURN_GAP_DAYS)).astype(int)
    curve = (
        pd.DataFrame({"t": t, "ev": ev})
        .groupby("t")
        .agg(c=("ev", "size"), d=("ev", "sum"))
        .sort_index()
    )
    total = int(curve["c"].sum())
    rows = q_customer_survival_km(spark, sf_dir).collect()
    assert [r["t_bucket"] for r in rows] == list(curve.index)
    surv, seen = 1_000_000, 0
    prev_risk = None
    for r, (tb, cr) in zip(rows, curve.iterrows()):
        risk = total - seen
        surv = surv * (risk - int(cr["d"])) // risk
        assert r["n_risk"] == risk
        assert r["n_events"] == int(cr["d"])
        assert r["n_censored"] == int(cr["c"]) - int(cr["d"])
        assert r["surv_ppm"] == surv
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk  # risk set strictly shrinks
        prev_risk = r["n_risk"]
        seen += int(cr["c"])
    # survival is monotone nonincreasing and starts at risk = everyone
    ppms = [r["surv_ppm"] for r in rows]
    assert ppms == sorted(ppms, reverse=True)
    assert rows[0]["n_risk"] == total


# ---------------------------------------------------------------------------
# orders_theilsen_trend
# ---------------------------------------------------------------------------

def test_theilsen_recount(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    m = (
        orders["o_orderdate"].dt.year * 12 + orders["o_orderdate"].dt.month - 1
    )
    mon = (
        pd.DataFrame({"m": m, "rc": cents}).groupby("m")["rc"].sum().sort_index()
    )
    ms, revs = list(mon.index), [int(x) for x in mon]
    n = len(ms)
    slopes = sorted(
        _trunc_div(1000 * (revs[j] - revs[i]), ms[j] - ms[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    med = slopes[(len(slopes) + 1) // 2 - 1]
    inters = sorted(1000 * revs[i] - med * ms[i] for i in range(n))
    medint = inters[(n + 1) // 2 - 1]
    sx, sy = sum(ms), sum(revs)
    sxy = sum(a * b for a, b in zip(ms, revs))
    sxx = sum(a * a for a in ms)
    ols = round(1000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
    r = q_orders_theilsen_trend(spark, sf_dir).collect()[0]
    assert r["n_months"] == n
    assert r["n_pairs"] == len(slopes)
    assert r["theilsen_slope_milli"] == med
    assert r["theilsen_intercept_milli"] == medint
    assert abs(r["ols_slope_milli"] - ols) < 1e-6


def _trunc_div(a: int, b: int) -> int:
    """Spark div / DuckDB // semantics: truncate toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


# ---------------------------------------------------------------------------
# orders_mann_whitney
# ---------------------------------------------------------------------------

def test_mann_whitney_vs_pandas_average_ranks(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    grp = orders["o_orderpriority"]
    ranks = cents.rank(method="average")  # tie-corrected average ranks
    n = len(cents)
    tie = cents.value_counts()
    tie_t = int((tie**3 - tie).sum())
    rows = q_orders_mann_whitney(spark, sf_dir).collect()
    assert len(rows) == grp.nunique()
    for r in rows:
        mask = grp == r["o_orderpriority"]
        n_g = int(mask.sum())
        r_g = float(ranks[mask].sum())
        u = r_g - n_g * (n_g + 1) / 2
        assert r["n_g"] == n_g
        assert r["u2"] == round(2 * u)  # doubled U is integer-exact
        mu = n_g * (n - n_g) / 2
        var = (
            n_g * (n - n_g) / 12 * ((n + 1) - tie_t / (n * (n - 1)))
        )
        z = round((u - mu) / np.sqrt(var), 4)
        assert abs(r["z"] - z) < 2e-4
        assert r["significant"] == (1 if abs(r["z"]) > 1.96 else 0)
    # U-statistics live in [0, n_g * (n - n_g)] (doubled: twice that)
    for r in rows:
        assert 0 <= r["u2"] <= 2 * r["n_g"] * (n - r["n_g"])


# ---------------------------------------------------------------------------
# second wave: mutual NN, CDC chunks, PMI, cohort LTV, Kruskal-Wallis
# ---------------------------------------------------------------------------

def test_mutual_nn_reciprocity_and_symmetry(spark, sf_dir):
    from c99_vectordb_spark.operators.similarity import lsh_bucketed_neighbors
    from c99_vectordb_spark.queries_ext import LSH_DIM, LSH_PLANES
    from c99_vectordb_spark.queries_wave7 import q_sim_mutual_nn
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    best = {
        r["qid"]: (r["id"], r["score"])
        for r in lsh_bucketed_neighbors(
            emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
            emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
            dim=LSH_DIM, k=1, n_planes=LSH_PLANES,
            multiprobe=True, broadcast_queries=False,
        ).collect()
    }
    want = {
        (a, b): s
        for a, (b, s) in best.items()
        if a < b and best.get(b, (None,))[0] == a
    }
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in q_sim_mutual_nn(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "corpus should contain mutual pairs"
    # reciprocity is strictly stronger than one-directional top-1
    assert len(want) < len(best)


def test_cdc_chunks_replay_and_laws(spark, sf_dir):
    from c99_vectordb_spark.queries_wave7 import (
        _CDC_GRAM, _CDC_MASK, q_dedup_cdc_chunks,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_src = collections.defaultdict(lambda: collections.Counter())
    for r in docs.itertuples():
        t = re.sub(r"\s+", " ", r.text).strip().lower()
        if not t:
            continue
        bounds = [0]
        if len(t) >= _CDC_GRAM:
            bounds += [
                i
                for i in range(_CDC_GRAM, len(t) + 1)
                if _md5_56(t[i - _CDC_GRAM : i]) % _CDC_MASK == 0
            ]
        bounds.append(len(t))
        for a, b in zip(bounds, bounds[1:]):
            if b > a:
                per_src[r.source][t[a:b]] += 1
    rows = {r["source"]: r for r in q_dedup_cdc_chunks(spark, sf_dir).collect()}
    assert set(rows) == set(per_src)
    for src, chunks in per_src.items():
        row = rows[src]
        n_chunks = sum(chunks.values())
        total = sum(len(c) * n for c, n in chunks.items())
        uniq = sum(len(c) for c in chunks)
        assert row["n_chunks"] == n_chunks
        assert row["n_unique"] == len(chunks)
        assert row["total_chars"] == total
        assert row["unique_chars"] == uniq
        assert row["savings_ppm"] == 1_000_000 * (total - uniq) // total
        # chunks tile the normalized text exactly: conservation law
        assert row["avg_chunk_len"] == total // n_chunks


def test_cdc_boundary_locality_constructed(spark):
    """THE content-defined-chunking property: a local edit re-chunks
    only its neighborhood — chunks far after the edit are identical
    (fixed-size blocks would shift every downstream boundary)."""
    from c99_vectordb_spark.queries_wave7 import _CDC_GRAM, _CDC_MASK

    base = "".join(
        f"word{_md5_56(f'tok:{i}') % 997} " for i in range(200)
    ).strip()
    edited = base[:50] + "INSERTED TEXT " + base[50:]

    def chunks(t):
        t = re.sub(r"\s+", " ", t).strip().lower()
        bounds = [0] + [
            i
            for i in range(_CDC_GRAM, len(t) + 1)
            if _md5_56(t[i - _CDC_GRAM : i]) % _CDC_MASK == 0
        ] + [len(t)]
        return [t[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]

    ca, cb = chunks(base), chunks(edited)
    shared = set(ca) & set(cb)
    # everything past the edit neighborhood dedups away
    assert len(shared) >= len(ca) - 3


def test_pmi_recount(spark, sf_dir):
    from c99_vectordb_spark.queries_wave7 import (
        _PMI_MIN_COUNT, _PMI_TOP, q_corpus_pmi_pairs,
    )

    def plog2(x):  # the shared q20->q10 piecewise log2
        msb = x.bit_length() - 1
        return (msb - 20) * 1024 + ((x - (1 << msb)) * 1024) // (1 << msb)

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    uni = collections.Counter()
    bi = collections.Counter()
    for text in docs["text"]:
        ts = re.findall(r"[a-z0-9_]+", text.lower())
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    q20 = 1 << 20
    scored = [
        (
            plog2(c * q20) + 2 * plog2(n_uni * q20) - plog2(n_bi * q20)
            - plog2(uni[a] * q20) - plog2(uni[b] * q20),
            a, b, c,
        )
        for (a, b), c in bi.items()
        if c >= _PMI_MIN_COUNT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(a, b, c, p) for p, a, b, c in scored[:_PMI_TOP]]
    got = [
        (r["w1"], r["w2"], r["c_ab"], r["pmi_q10"])
        for r in q_corpus_pmi_pairs(spark, sf_dir).collect()
    ]
    assert got == want


def test_cohort_ltv_identities(spark, sf_dir):
    from c99_vectordb_spark.queries_wave7 import q_customer_cohort_ltv

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    rows = q_customer_cohort_ltv(spark, sf_dir).collect()
    # total revenue conservation across the whole matrix
    assert sum(r["rev_cents"] for r in rows) == int(cents.sum())
    # age-0 cell exists for every cohort (the first order IS age 0)
    by_cohort = collections.defaultdict(list)
    for r in rows:
        by_cohort[r["cohort"]].append(r)
    n_cust = orders["o_custkey"].nunique()
    assert sum(rs[0]["cohort_size"] for rs in by_cohort.values()) == n_cust
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age"])
        assert rs[0]["age"] == 0
        # cumulative is the running sum; LTV is its floored per-head
        run = 0
        for r in rs:
            run += r["rev_cents"]
            assert r["cum_rev_cents"] == run
            assert r["ltv_cents"] == run // r["cohort_size"]
            assert 1 <= r["n_active"] <= r["cohort_size"]


def test_kruskal_wallis_vs_pandas(spark, sf_dir):
    from c99_vectordb_spark.queries_wave7 import q_orders_kruskal_wallis

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    grp = orders["o_orderpriority"]
    ranks = cents.rank(method="average")
    n = len(cents)
    tie = cents.value_counts()
    tie_t = int((tie**3 - tie).sum())
    rsum = sum(
        float(ranks[grp == g].sum()) ** 2 / int((grp == g).sum())
        for g in grp.unique()
    )
    h0 = 12.0 / (n * (n + 1)) * rsum - 3 * (n + 1)
    h = round(h0 / (1 - tie_t / (n**3 - n)), 4)
    r = q_orders_kruskal_wallis(spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert r["n_groups"] == grp.nunique()
    assert r["tie_t"] == tie_t
    assert abs(r["h"] - h) < 2e-3
    assert r["significant"] == (1 if r["h"] * 1e6 > 9_487_729 else 0)
