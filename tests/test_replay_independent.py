"""Independent pure-Python replays of the engine-neutral unrolled
chains (round-6 verdict item #7).

The Hilbert lesson (tests/test_session8_wave.py): when BOTH engines
replay the same hand-unrolled algebra, the oracle proves consistency,
not correctness — both can be identically wrong. Each test here
re-implements the published algorithm from scratch (straight from the
paper's definition, sharing NO code with the operators or their DuckDB
twins) and checks the engine output against it:

- PageRank (Brin & Page 1998, damped, no dangling redistribution)
- Label propagation (Raghavan et al. 2007, self-vote, min-label ties)
- Markov removal-effect attribution (Anderl et al. 2014) — replayed
  from the raw event log with pandas, plus an EXACT absorption check
  with Fractions on a DAG fixture where 8 value-iteration rounds
  provably converge
- Kaplan-Meier product-limit (Kaplan & Meier 1958) — replayed from
  the raw orders table, plus a float-estimator cross-check
"""

from __future__ import annotations

import collections
from fractions import Fraction

import duckdb
import pandas as pd
import pytest

PPM = 1_000_000

# ---------------------------------------------------------------- fixtures

#: deterministic digraph: a hub (0), a chain, a dangling node (7),
#: a node that only ever appears as dst (9), and a 2-cycle
_EDGES = [
    (0, 1), (0, 2), (0, 3), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3),
    (6, 0), (6, 7), (8, 9), (2, 9), (7, 9),
]


def _values_cte(edges) -> str:
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    return (
        "edges AS MATERIALIZED (SELECT * FROM (VALUES "
        + vals
        + ") t(src, dst))"
    )


# ------------------------------------------------------------ 1. PageRank


def _pagerank_independent(edges, iters, scale, num, den):
    """Textbook damped PageRank in exact integers, written from the
    recurrence definition: r0 = scale; contrib(u) = floor(r(u)/out(u));
    r'(v) = floor((den-num)*scale/den) + floor(num*sum/den)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = collections.Counter(s for s, _ in edges)
    incoming = collections.defaultdict(list)
    for s, d in edges:
        incoming[d].append(s)
    base = (den - num) * scale // den
    r = {v: scale for v in nodes}
    for _ in range(iters):
        r = {
            v: base + (num * sum(r[u] // out[u] for u in incoming[v])) // den
            for v in nodes
        }
    return r


def test_pagerank_matches_independent_replay(spark):
    from c99_vectordb_spark.operators.graph import (
        PR_SCALE,
        duckdb_pagerank_sql,
        pagerank,
    )

    expected = _pagerank_independent(_EDGES, 3, PR_SCALE, 85, 100)

    edges_df = spark.createDataFrame(_EDGES, "src long, dst long")
    got_spark = {
        r["node"]: r["pr_fp"] for r in pagerank(edges_df, iters=3).collect()
    }
    assert got_spark == expected

    sql = duckdb_pagerank_sql(_values_cte(_EDGES), iters=3)  # carries WITH
    got_duck = dict(duckdb.sql(sql).fetchall())
    assert got_duck == expected

    # shared-spec sanity: the integer fixed point must track FLOAT
    # pagerank of the same recurrence (catches identically-wrong
    # algebra that exact twin-equality cannot)
    nodes = sorted(expected)
    out = collections.Counter(s for s, _ in _EDGES)
    rf = {v: 1.0 for v in nodes}
    for _ in range(3):
        rf = {
            v: 0.15
            + 0.85 * sum(rf[u] / out[u] for u, d in _EDGES if d == v)
            for v in nodes
        }
    for v in nodes:
        assert abs(expected[v] / PPM - rf[v]) < 0.002, (v, expected[v], rf[v])


# --------------------------------------------------- 2. Label propagation


def _lpa_independent(edges, iters):
    """Synchronous LPA from the paper's update rule: every node adopts
    the most frequent label among its (undirected) neighbors plus its
    own current label; ties break to the smallest label."""
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    neigh = collections.defaultdict(list)
    for s, d in und:
        neigh[s].append(d)
    labels = {v: v for v in neigh}
    for _ in range(iters):
        nxt = {}
        for v in neigh:
            votes = collections.Counter(labels[u] for u in neigh[v])
            votes[labels[v]] += 1
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            nxt[v] = best[0]
        labels = nxt
    return labels


def test_label_propagation_matches_independent_replay(spark):
    from c99_vectordb_spark.operators.graph import (
        duckdb_label_propagation_sql,
        label_propagation,
    )

    expected = _lpa_independent(_EDGES, 3)

    edges_df = spark.createDataFrame(_EDGES, "src long, dst long")
    got_spark = {
        r["node"]: r["label"]
        for r in label_propagation(edges_df, iters=3).collect()
    }
    assert got_spark == expected

    sql = duckdb_label_propagation_sql(_values_cte(_EDGES), iters=3)
    got_duck = dict(
        duckdb.sql("WITH " + sql + " SELECT node, label FROM lp_l3").fetchall()
    )
    assert got_duck == expected


# ------------------------------------------- 3. Markov attribution chain


def _journeys_from_events(df: pd.DataFrame):
    """Transition counts straight from the operator's CONTRACT: order
    each user's events by (ts_us, event_id); journeys restart after a
    purchase; purchase absorbs as 'conv'; a journey that ends without
    purchase absorbs its last channel into 'null'."""
    counts: collections.Counter = collections.Counter()
    for _, g in df.sort_values(["user_id", "ts_us", "event_id"]).groupby(
        "user_id"
    ):
        prev = None
        types = list(g["event_type"])
        for i, et in enumerate(types):
            src = "start" if prev is None or prev == "purchase" else prev
            dst = "conv" if et == "purchase" else et
            counts[(src, dst)] += 1
            if i == len(types) - 1 and et != "purchase":
                counts[(et, "null")] += 1
            prev = et
    return counts


def _absorption_exact(counts, removed):
    """EXACT absorption probability into 'conv' from 'start' via
    Fractions — solved by iterating the linear system far past any
    path length, so on a DAG it is the true fixed point, independent
    of the operators' 8-round truncated integer spec."""
    eff: collections.Counter = collections.Counter()
    for (s, d), c in counts.items():
        eff[(s, "null" if d == removed else d)] += c
    states = sorted({s for s, _ in eff})
    out = collections.Counter()
    for (s, _), c in eff.items():
        out[s] += c
    p = {s: Fraction(0) for s in states}
    for _ in range(64):
        p = {
            s: sum(
                (
                    Fraction(c)
                    * (
                        Fraction(1)
                        if d == "conv"
                        else Fraction(0)
                        if d == "null"
                        else p.get(d, Fraction(0))
                    )
                    for (s2, d), c in eff.items()
                    if s2 == s
                ),
                Fraction(0),
            )
            / out[s]
            for s in states
        }
    return p["start"]


def test_attribution_markov_matches_raw_event_replay(spark, sf_dir):
    """Full-spec replay from the raw parquet with pandas: transition
    construction (window-free), then the 8-round integer fixed point
    re-coded from the recurrence — must equal the Spark output row for
    row."""
    from c99_vectordb_spark.queries_ext import q_attribution_markov

    rows = {
        r["channel"]: r for r in q_attribution_markov(spark, sf_dir).collect()
    }

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "ts", "event_id", "event_type"]
    ]
    # canonical micros timestamp (matches functions.text normalization)
    ev["ts_us"] = ev["ts"].astype("int64") // (
        1 if ev["ts"].dtype == "datetime64[us]" else 1000
    )
    counts = _journeys_from_events(ev)

    def fixed_point_int(removed):
        eff: collections.Counter = collections.Counter()
        for (s, d), c in counts.items():
            eff[(s, "null" if d == removed else d)] += c
        states = sorted({s for s, _ in eff})
        out = collections.Counter()
        for (s, _), c in eff.items():
            out[s] += c
        p = {s: 0 for s in states}
        for _ in range(8):
            p = {
                s: sum(
                    c
                    * (
                        PPM
                        if d == "conv"
                        else 0
                        if d == "null"
                        else p.get(d, 0)
                    )
                    for (s2, d), c in eff.items()
                    if s2 == s
                )
                // out[s]
                for s in states
            }
        return p["start"]

    channels = sorted({s for s, _ in counts} - {"start"})
    assert sorted(rows) == channels
    p_full = fixed_point_int(None)
    effs = {}
    for ch in channels:
        p_rem = fixed_point_int(ch)
        effs[ch] = PPM - (PPM * p_rem) // p_full
        assert rows[ch]["p_full_ppm"] == p_full
        assert rows[ch]["p_removed_ppm"] == p_rem
        assert rows[ch]["removal_effect_ppm"] == effs[ch]
    tot = sum(effs.values())
    for ch in channels:
        assert rows[ch]["share_ppm"] == (PPM * effs[ch]) // tot


def test_attribution_markov_exact_absorption_on_dag(spark, tmp_path):
    """On a DAG fixture (channels only move a->b->c, so every journey
    path has length <= 4) the 8-round truncated spec must agree with
    the EXACT Fraction absorption probability to within the documented
    few-ppm truncation loss — independent of iteration count."""
    from c99_vectordb_spark.queries_ext import q_attribution_markov

    recs = []
    eid = 0

    def user(uid, *types):
        nonlocal eid
        for i, et in enumerate(types):
            recs.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-01-01")
                    + pd.Timedelta(minutes=i),
                    "user_id": uid,
                    "event_type": et,
                    "value": 0.0,
                    "props": "{}",
                }
            )
            eid += 1

    # forward-only journeys over channels a < b < c
    user(1, "a", "b", "purchase")
    user(2, "a", "c")
    user(3, "b", "c", "purchase")
    user(4, "a", "b", "c")
    user(5, "a", "purchase")
    user(6, "b", "c")
    user(7, "a", "b", "c", "purchase")
    user(8, "c", "purchase")
    user(9, "a", "b")
    user(10, "c")
    pd.DataFrame(recs).to_parquet(tmp_path / "events.parquet")

    got = {
        r["channel"]: r
        for r in q_attribution_markov(spark, str(tmp_path)).collect()
    }
    ev = pd.read_parquet(tmp_path / "events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    counts = _journeys_from_events(ev)

    exact_full = _absorption_exact(counts, None)
    for ch, r in got.items():
        exact_rem = _absorption_exact(counts, ch)
        assert abs(r["p_full_ppm"] - float(exact_full) * PPM) <= 20
        assert abs(r["p_removed_ppm"] - float(exact_rem) * PPM) <= 20
        exact_eff = float(1 - exact_rem / exact_full) * PPM
        assert abs(r["removal_effect_ppm"] - exact_eff) <= 200


# -------------------------------------------- 4. Kaplan-Meier recurrence


def test_survival_km_matches_independent_replay(spark, sf_dir):
    from c99_vectordb_spark.queries_wave7 import (
        _KM_BUCKET_DAYS,
        _KM_CHURN_GAP_DAYS,
        q_customer_survival_km,
    )

    rows = [r.asDict() for r in q_customer_survival_km(spark, sf_dir).collect()]
    assert rows

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    per = orders.groupby("o_custkey")["o_orderdate"].agg(["min", "max"])
    max_d = orders["o_orderdate"].max()
    lifetimes = (per["max"] - per["min"]).dt.days // _KM_BUCKET_DAYS
    churned = per["max"] < max_d - pd.Timedelta(days=_KM_CHURN_GAP_DAYS)

    buckets = sorted(lifetimes.unique())
    total = len(per)
    gone = 0
    surv_int = PPM
    surv_float = 1.0
    expect = []
    for t in buckets:
        in_bucket = lifetimes == t
        c = int(in_bucket.sum())
        d = int((in_bucket & churned).sum())
        risk = total - gone
        surv_int = surv_int * (risk - d) // risk
        surv_float *= 1 - d / risk
        expect.append(
            {
                "t_bucket": t,
                "n_risk": risk,
                "n_events": d,
                "n_censored": c - d,
                "surv_ppm": surv_int,
            }
        )
        gone += c
        # floored ppm recurrence loses <= 1 ppm per step vs the
        # textbook float estimator (the documented contract)
        assert 0 <= surv_float * PPM - surv_int <= len(expect) + 1

    assert rows == expect


# ------------------------------------- 5. Holt-Winters triple smoothing


def test_holt_winters_matches_independent_replay(spark, sf_dir):
    """Additive Holt-Winters re-coded from the Winters (1960) update
    equations with a season DICT keyed by t mod m (the operator and
    its DuckDB recursive CTE both shift a 12-slot QUEUE — a different
    data structure expressing the same recurrence, so a shared
    off-by-one in the queue rotation would make the twins identically
    wrong while this replay diverges; the r7 verdict's Hilbert-class
    ask #7). Everything is exact integers: monthly cents from the raw
    parquet with pandas, alpha/beta/gamma as tenths, division
    TRUNCATING toward zero per the documented spec."""
    from c99_vectordb_spark.queries_wave9 import q_orders_holt_winters

    rows = [r.asDict() for r in q_orders_holt_winters(spark, sf_dir).collect()]
    assert len(rows) == 12

    def tdiv(a: int, b: int) -> int:  # truncate toward zero
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    mid = (
        orders["o_orderdate"].dt.year * 12 + orders["o_orderdate"].dt.month - 1
    )
    cents = (orders["o_totalprice"] * 100 + 0.5).apply(
        lambda v: int(v // 1)
    )  # HALF_UP for positive prices, like both engines' round()
    monthly = (
        pd.DataFrame({"mid": mid, "cents": cents})
        .groupby("mid")["cents"]
        .sum()
        .sort_index()
    )
    xs = [int(v) for v in monthly.values]
    mids = [int(v) for v in monthly.index]
    m, al, be, ga = 12, 2, 1, 3
    assert len(xs) >= 2 * m

    level = tdiv(sum(xs[:m]), m)
    trend = tdiv(sum(xs[m : 2 * m]) - sum(xs[:m]), m * m)
    season = {j % m: xs[j] - level for j in range(m)}
    for t in range(m, len(xs)):
        sm = season[t % m]  # the value created at step t - m
        prev = level
        level = tdiv(al * (xs[t] - sm) + (10 - al) * (prev + trend), 10)
        trend = tdiv(be * (level - prev) + (10 - be) * trend, 10)
        season[t % m] = tdiv(ga * (xs[t] - level) + (10 - ga) * sm, 10)

    t_last = len(xs) - 1
    expect = [
        {
            "h": h,
            "month_index": mids[-1] + h,
            "forecast_cents": level + h * trend + season[(t_last + h) % m],
        }
        for h in range(1, 13)
    ]
    assert rows == expect
