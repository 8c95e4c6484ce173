"""Session-8 wave: independent recounts (pure Python / pandas — NOT the
DuckDB oracle, which the driver gate already runs) and algebraic laws
for the new operators, plus the stream==batch proof for the off-policy
evaluator's mergeable state.
"""

from __future__ import annotations

import math
import os
import tempfile

import pytest

from c99_vectordb_spark import queries_wave8 as w8


# ---------------------------------------------------------------------------
# zorder_hilbert: bijectivity + unit-step adjacency (the locality law)
# ---------------------------------------------------------------------------


def _xy2d_ref(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_steps_match_reference(spark):
    """The unrolled engine-neutral step SQL == the canonical xy2d on a
    full 32x32 grid (exhaustive at 5 bits via the 10-bit path: low
    coordinates exercise every rotation branch)."""
    rows = [(x * 32 + y, x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "pk LONG, x LONG, y LONG").selectExpr(
        "pk", "x", "y", "x AS hx", "y AS hy", "cast(0 AS bigint) AS d"
    )
    # rename state cols to the helper's expected names
    df = df.selectExpr("pk", "x AS zx", "y AS zy", "hx AS x", "hy AS y", "d")
    for x_new, y_new, d_new in w8._hilbert_steps(w8._HILBERT_BITS):
        df = df.selectExpr(
            "pk", "zx", "zy", f"{x_new} AS x", f"{y_new} AS y", f"{d_new} AS d"
        )
    got = {(r.zx, r.zy): r.d for r in df.collect()}
    n = 1 << w8._HILBERT_BITS
    for (x, y), d in got.items():
        assert d == _xy2d_ref(n, x, y)


def test_hilbert_unit_step_adjacency():
    """THE Hilbert property Z-order lacks: consecutive curve positions
    are always grid-adjacent (|dx| + |dy| == 1) — checked exhaustively
    over the first 4096 positions of the 1024x1024 curve via the
    reference d2xy inverse."""

    def d2xy(n, d):
        x = y = 0
        t = d
        s = 1
        while s < n:
            rx = 1 & (t // 2)
            ry = 1 & (t ^ rx)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            x += s * rx
            y += s * ry
            t //= 4
            s *= 2
        return x, y

    n = 1 << w8._HILBERT_BITS
    prev = d2xy(n, 0)
    assert _xy2d_ref(n, *prev) == 0
    for d in range(1, 4096):
        cur = d2xy(n, d)
        assert abs(cur[0] - prev[0]) + abs(cur[1] - prev[1]) == 1
        # and the forward map inverts the inverse
        assert _xy2d_ref(n, *cur) == d
        prev = cur


# ---------------------------------------------------------------------------
# text_char_entropy: exact pure-Python recount of the q10 fixed point
# ---------------------------------------------------------------------------


def _plog2_py(ratio: int) -> int:
    """Python twin of operators/corpus._plog2_cols (ratio in q20)."""
    msb = ratio.bit_length() - 1
    return (msb - 20) * 1024 + ((ratio - (1 << msb)) * 1024) // (1 << msb)


def test_char_entropy_recount(spark, sf_dir, documents):
    import collections

    got = {
        r.doc_id: (r.n_chars, r.n_distinct_chars, r.entropy_q10, r.is_low)
        for r in w8.q_text_char_entropy(spark, sf_dir).collect()
    }
    docs = {r.doc_id: r.text for r in documents.collect()}
    assert set(got) == set(docs)
    for did, text in docs.items():
        n = len(text)
        cnt = collections.Counter(text)
        t = sum(c * _plog2_py((n << 20) // c) for c in cnt.values())
        h = t // n
        assert got[did] == (n, len(cnt), h, 1 if h < w8._ENTROPY_LOW_Q10 else 0)
        # entropy bounds: 0 <= H <= log2(n_distinct) (q10, + rounding slack)
        assert 0 <= h <= int(1024 * math.log2(max(len(cnt), 2))) + 1


# ---------------------------------------------------------------------------
# stats_spearman: pandas average-rank cross-check
# ---------------------------------------------------------------------------


def test_spearman_vs_pandas(spark, sf_dir):
    import pandas as pd

    got = {
        r.l_returnflag: (r.n, r.pearson_r, r.spearman_rho)
        for r in w8.q_stats_spearman(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["xv"] = (li.l_quantity * 100).round().astype("int64")
    li["yv"] = (li.l_extendedprice * 100).round().astype("int64")
    for flag, g in li.groupby("l_returnflag"):
        n, pr, sr = got[flag]
        assert n == len(g)
        assert pr == pytest.approx(g.xv.corr(g.yv, method="pearson"), abs=1e-4)
        # Spearman = Pearson on average ranks (no scipy in this env)
        rx = g.xv.rank(method="average")
        ry = g.yv.rank(method="average")
        assert sr == pytest.approx(rx.corr(ry, method="pearson"), abs=1e-4)


# ---------------------------------------------------------------------------
# anonymize_kanon_report: pandas recount + internal consistency
# ---------------------------------------------------------------------------


def test_kanon_recount(spark, sf_dir):
    import pandas as pd

    rep = {
        r.c_nationkey: r.asDict()
        for r in w8.q_anonymize_kanon_report(spark, sf_dir).collect()
    }
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cents = (c.c_acctbal * 100).round().astype("int64")
    c["b"] = cents // w8._KANON_BUCKET_CENTS  # python // floors, like the op
    cls = (
        c.groupby(["c_nationkey", "b"])
        .agg(k=("c_mktsegment", "size"), l=("c_mktsegment", "nunique"))
        .reset_index()
    )
    for nk, g in cls.groupby("c_nationkey"):
        r = rep[nk]
        assert r["n_rows"] == int(g.k.sum())
        assert r["n_classes"] == len(g)
        assert r["k_min"] == int(g.k.min())
        assert r["rows_below_k"] == int(g.k[g.k < w8._KANON_K].sum())
        assert r["l_min"] == int(g.l.min())
        assert r["classes_l1"] == int((g.l == 1).sum())
    assert sum(r["n_rows"] for r in rep.values()) == len(c)


# ---------------------------------------------------------------------------
# events_acf: numpy recount on the dense series
# ---------------------------------------------------------------------------


def test_acf_recount(spark, sf_dir):
    import numpy as np
    import pandas as pd

    got = {r.lag: (r.n_pairs, r.acf) for r in w8.q_events_acf(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # epoch micros -> hour index (timestamps are post-1970 in testdata)
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    h = us // w8._HOUR_US
    lo, hi2 = h.min(), h.max()
    c = np.zeros(hi2 - lo + 1, dtype=np.int64)
    for v in h:
        c[v - lo] += 1
    mu = c.mean()
    den = ((c - mu) ** 2).sum()
    for k in w8._ACF_LAGS:
        n_pairs, acf = got[k]
        assert n_pairs == len(c) - k
        ref = ((c[:-k] - mu) * (c[k:] - mu)).sum() / den
        assert acf == pytest.approx(ref, abs=1e-4)


# ---------------------------------------------------------------------------
# dedup_edit_pairs: pure-Python Levenshtein recount of every output pair
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_pairs_recount(spark, sf_dir, documents):
    import re

    rows = w8.q_dedup_edit_pairs(spark, sf_dir).collect()
    norm = {
        r.doc_id: re.sub(r"[^a-zA-Z0-9 ]", "", r.text).lower()
        for r in documents.collect()
    }
    for r in rows:
        d = _lev(norm[r.id_a], norm[r.id_b])
        assert r.dist == d
        assert r.len_a == len(norm[r.id_a]) and r.len_b == len(norm[r.id_b])
        assert r.sim_ppm == 1_000_000 - (1_000_000 * d) // max(
            r.len_a, r.len_b, 1
        )
        assert r.is_dup == (1 if d <= w8._EDIT_DUP_DIST else 0)
        # the blocking precondition: shared normalized prefix
        assert (
            norm[r.id_a][: w8._EDIT_PREFIX] == norm[r.id_b][: w8._EDIT_PREFIX]
        )


# ---------------------------------------------------------------------------
# events_policy_ips: python recount + stream==batch mergeable-state proof
# ---------------------------------------------------------------------------


def test_policy_ips_recount(spark, sf_dir):
    import pandas as pd

    row = w8.q_events_policy_ips(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    cents = (ev.value * 100).round().astype("int64")
    mid = (us.min() + us.max()) // 2
    tr = us <= mid
    arms = sorted(ev.event_type.unique())
    stats = {
        a: (
            int(cents[tr & (ev.event_type == a).values].sum()),
            int((tr & (ev.event_type == a).values).sum()),
            int(cents[~tr & (ev.event_type == a).values].sum()),
            int((~tr & (ev.event_type == a).values).sum()),
        )
        for a in arms
    }
    # truncating division (Spark div / DuckDB //), NOT python floor //,
    # and only arms with train-half presence are eligible (both mirror
    # the query — review finding). Fraction keeps it exact at any
    # magnitude (a float detour would not).
    from fractions import Fraction
    from math import trunc

    eligible = [a for a in arms if stats[a][1] > 0]
    star = min(
        eligible,
        key=lambda a: (-trunc(Fraction(1_000_000 * stats[a][0], stats[a][1])), a),
    )
    s_tr, n_tr, s_ev, n_ev = stats[star]
    n_train = sum(v[1] for v in stats.values())
    n_eval = sum(v[3] for v in stats.values())
    s_eval = sum(v[2] for v in stats.values())
    qhat = s_tr / n_tr
    corr = n_train / (n_tr * n_eval)
    assert row.arm_star == star
    assert row.p_star_ppm == (1_000_000 * n_tr) // n_train
    assert row.v_logged == pytest.approx(s_eval / n_eval / 100, abs=1e-4)
    assert row.v_dm == pytest.approx(qhat / 100, abs=1e-4)
    assert row.v_ips == pytest.approx(s_ev * corr / 100, abs=1e-4)
    assert row.v_dr == pytest.approx(
        (qhat + (s_ev - n_ev * qhat) * corr) / 100, abs=1e-4
    )


def test_stream_policy_ips_matches_batch(spark):
    """Two micro-batches through the foreachBatch partial-state stream,
    merged, == the batch helpers on the full replay (the mergeable-
    state proof across real micro-batch boundaries)."""
    import datetime as dt
    import time as _t

    from c99_vectordb_spark.streaming.ingest import stream_policy_ips

    def ev(i, minute, typ, val):
        return (i, dt.datetime(2024, 1, 1, minute // 60, minute % 60), 1, typ, val)

    b1 = [ev(1, 10, "a", 1.5), ev(2, 70, "b", 2.0), ev(3, 15, "a", 0.5),
          ev(4, 200, "b", 9.0)]
    b2 = [ev(5, 20, "b", 3.25), ev(6, 130, "a", 7.0), ev(7, 75, "a", 0.125),
          ev(8, 190, "b", 4.0)]
    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE"
    )
    # fixed midpoint config: 100 minutes into 2024-01-01, in epoch micros
    mid_us = int(dt.datetime(2024, 1, 1, 1, 40).timestamp() * 1_000_000)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for name, batch, age in (("b1.parquet", b1, 60), ("b2.parquet", b2, 0)):
            spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
                os.path.join(src, name)
            )
            ts = _t.time() - age
            for root, _dirs, files in os.walk(os.path.join(src, name)):
                for f in files:
                    os.utime(os.path.join(root, f), (ts, ts))
        states = []

        def sink(df, batch_id):
            states.append(df.localCheckpoint(eager=True))

        q = stream_policy_ips(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src),
            mid_us,
            sink,
            os.path.join(tmp, "ckpt"),
        ).start()
        q.awaitTermination(120)
        assert len(states) == 2, "expected two micro-batches"
        got = w8.policy_estimates(w8.merge_policy_states(*states)).collect()[0]

        from c99_vectordb_spark.functions.text import normalize_event_time
        from pyspark.sql import functions as F  # noqa: F401

        allev = normalize_event_time(
            spark.createDataFrame(b1 + b2, schema)
        ).selectExpr(
            "event_type AS arm",
            "cast(round(value * 100) AS bigint) AS cents",
            f"CASE WHEN ts_us <= {mid_us}L THEN 1L ELSE 0L END AS is_train",
        )
        want = w8.policy_estimates(w8.policy_arm_partials(allev)).collect()[0]
        assert got.asDict() == want.asDict()


# ---------------------------------------------------------------------------
# sim_lof_outliers: full pure-Python replay at sf0.001
# ---------------------------------------------------------------------------


def test_lof_replay_pure_python(spark, sf_dir, embeddings):
    """Recompute the ENTIRE LOF pipeline (buckets, multiprobe
    candidates, int8-code distances, kNN, k-dist, reachability, lrd
    fold, final ratio) in pure Python on the sf0.001 embeddings and
    compare the top rows exactly."""
    import collections

    from c99_vectordb_spark.operators.similarity import hyperplane
    from c99_vectordb_spark.queries_ext import LSH_DIM, LSH_PLANES

    K = w8._LOF_K
    vecs = {r.vec_id: list(r.embedding) for r in embeddings.collect()}
    planes = [hyperplane(p, LSH_DIM) for p in range(LSH_PLANES)]

    def bucket(v):
        b = 0
        for p, pl in enumerate(planes):
            if sum(x * y for x, y in zip(v, pl)) >= 0:
                b |= 1 << p
        return b

    codes = {
        i: [math.floor((x + 1.0) * 127.5 + 0.5) for x in v]
        for i, v in vecs.items()
    }
    buck = {i: bucket(v) for i, v in vecs.items()}
    by_bucket = collections.defaultdict(list)
    for i, b in buck.items():
        by_bucket[b].append(i)

    def knn(qid):
        probes = {buck[qid]} | {buck[qid] ^ (1 << p) for p in range(LSH_PLANES)}
        cand = []
        for b in probes:
            for i in by_bucket.get(b, []):
                if i != qid:
                    d = sum(
                        (a - c) ** 2 for a, c in zip(codes[i], codes[qid])
                    )
                    cand.append((d, i))
        cand.sort()
        return cand[:K]

    nn = {q: knn(q) for q in vecs}
    kd = {q: nbrs[-1][0] for q, nbrs in nn.items() if len(nbrs) == K}
    s = {}
    for q, nbrs in nn.items():
        if len(nbrs) < K or any(i not in kd for _, i in nbrs):
            continue
        s[q] = max(sum(max(d, kd[i]) for d, i in nbrs), 1)
    lof = {}
    for q in s:
        nbr_ids = sorted(i for _, i in nn[q])
        if any(i not in s for i in nbr_ids):
            continue
        inv = 0.0
        for i in nbr_ids:
            inv += 1.0 / s[i]
        lof[q] = round((s[q] / float(K)) * inv, 4)
    want = sorted(lof.items(), key=lambda kv: (-kv[1], kv[0]))[: w8._LOF_TOP]
    got = [
        (r.id, r.lof) for r in w8.q_sim_lof_outliers(spark, sf_dir).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# corpus_textrank: graph laws + rank-mass conservation flavor
# ---------------------------------------------------------------------------


def test_textrank_laws(spark, sf_dir):
    rows = w8.q_corpus_textrank(spark, sf_dir).collect()
    assert 0 < len(rows) <= w8._TEXTRANK_TOP
    assert all(len(r.word) >= w8._TEXTRANK_MIN_LEN for r in rows)
    assert all(r.pr_fp > 0 for r in rows)
    # descending by rank, ties by word
    key = [(-r.pr_fp, r.word) for r in rows]
    assert key == sorted(key)


# ---------------------------------------------------------------------------
# stats_chi2_independence / orders_anova_f / sketch_f2_moment recounts
# ---------------------------------------------------------------------------


def test_chi2_independence_recount(spark, sf_dir):
    import pandas as pd

    row = w8.q_stats_chi2_independence(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cells = o.groupby(["o_orderpriority", "o_orderstatus"]).size()
    R = cells.groupby(level=0).sum()
    C = cells.groupby(level=1).sum()
    N = int(cells.sum())
    t = sum(
        (N * int(obs) - int(R[p]) * int(C[s])) ** 2 // (int(R[p]) * int(C[s]))
        for (p, s), obs in cells.items()
    )
    assert row.n == N
    assert row.dof == (len(R) - 1) * (len(C) - 1)
    assert row.chi2_ppm == (1_000_000 * t) // N
    assert row.independent == (
        1 if row.chi2_ppm <= w8._CHI2_CRIT_PPM_DOF8 else 0
    )


def test_anova_f_recount(spark, sf_dir):
    import pandas as pd

    row = w8.q_orders_anova_f(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype("int64")
    g = cents.groupby(o.o_orderpriority)
    k, n = g.ngroups, len(cents)
    # order-pinned fold, same as both engines (group-name order)
    sg2n = 0.0
    for _, gg in sorted(g, key=lambda kv: kv[0]):
        sg2n += float(int(gg.sum())) ** 2 / len(gg)
    s, q = int(cents.sum()), sum(int(v) ** 2 for v in cents)
    ssb = sg2n - float(s) ** 2 / n
    ssw = float(q) - sg2n
    assert (row.k, row.n) == (k, n)
    assert row.f_stat == pytest.approx((ssb / (k - 1)) / (ssw / (n - k)), abs=1e-4)
    assert row.eta_sq == pytest.approx(ssb / (ssb + ssw), abs=1e-4)


def test_f2_sketch_recount(spark, sf_dir):
    """Replay the AMS sketch from python hashlib md5 (the independent
    hash path) and check the estimator algebra + the exact F2."""
    import collections
    import hashlib

    import pandas as pd

    row = w8.q_sketch_f2_moment(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")

    def md5_56(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)

    nbits = w8._AMS_GROUPS * w8._AMS_PER_GROUP
    sums = [0] * nbits
    for uid in ev.user_id:
        h = md5_56(str(int(uid)))
        for i in range(nbits):
            sums[i] += 1 if (h >> i) & 1 else -1
    means = sorted(
        sum(
            sums[g * w8._AMS_PER_GROUP + j] ** 2
            for j in range(w8._AMS_PER_GROUP)
        )
        // w8._AMS_PER_GROUP
        for g in range(w8._AMS_GROUPS)
    )
    f2_ams = means[(w8._AMS_GROUPS + 1) // 2 - 1]
    cnt = collections.Counter(int(u) for u in ev.user_id)
    f2_exact = sum(c * c for c in cnt.values())
    assert row.n_events == len(ev)
    assert row.n_users == len(cnt)
    assert row.f2_exact == f2_exact
    assert row.f2_ams == f2_ams
    assert row.err_ppm == (1_000_000 * abs(f2_ams - f2_exact)) // f2_exact


def test_stream_f2_sketch_matches_batch(spark):
    """Two micro-batches through the foreachBatch AMS partials, merged,
    == the batch sketch on the full replay (O(1)-state mergeable-
    sketch proof across real micro-batch boundaries)."""
    import datetime as dt
    import time as _t

    from c99_vectordb_spark.streaming.ingest import stream_f2_sketch

    def ev(i, uid):
        return (i, dt.datetime(2024, 1, 1, 0, i), uid, "view", 1.0)

    b1 = [ev(i, uid) for i, uid in enumerate([1, 2, 2, 3, 7, 7, 7])]
    b2 = [ev(i + 10, uid) for i, uid in enumerate([2, 5, 7, 7, 1, 9])]
    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE"
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for name, batch, age in (("b1.parquet", b1, 60), ("b2.parquet", b2, 0)):
            spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
                os.path.join(src, name)
            )
            ts = _t.time() - age
            for root, _dirs, files in os.walk(os.path.join(src, name)):
                for f in files:
                    os.utime(os.path.join(root, f), (ts, ts))
        states = []

        def sink(df, batch_id):
            states.append(df.localCheckpoint(eager=True))

        q = stream_f2_sketch(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src),
            sink,
            os.path.join(tmp, "ckpt"),
        ).start()
        q.awaitTermination(120)
        assert len(states) == 2, "expected two micro-batches"
        got = w8.f2_estimate(w8.merge_f2_states(*states)).collect()[0]
        want = w8.f2_estimate(
            w8.f2_sign_partials(spark.createDataFrame(b1 + b2, schema))
        ).collect()[0]
        assert got.asDict() == want.asDict()


def test_ks_test_recount(spark, sf_dir):
    import numpy as np
    import pandas as pd

    row = w8.q_orders_ks_test(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype("int64")
    a = np.sort(cents[o.o_orderpriority == w8._KS_A].values)
    b = np.sort(cents[o.o_orderpriority == w8._KS_B].values)
    na, nb = len(a), len(b)
    support = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, support, side="right")
    cb = np.searchsorted(b, support, side="right")
    d_num = int(np.max(np.abs(ca.astype(np.int64) * nb - cb.astype(np.int64) * na)))
    assert (row.n_a, row.n_b, row.d_num) == (na, nb, d_num)
    assert row.ks_stat == pytest.approx(d_num / (na * nb), abs=1e-4)
    crit = w8._KS_COEF * math.sqrt((na + nb) / (na * nb))
    assert row.crit == pytest.approx(crit, abs=1e-4)
    assert row.same_dist == (1 if row.ks_stat <= row.crit else 0)


def test_eval_map_recount(spark, sf_dir, embeddings):
    """Rebuild MAP/MRR in pure Python from the same LSH bucket spec and
    exact cosine ground truth at sf0.001."""
    import collections

    from c99_vectordb_spark.operators.similarity import hyperplane
    from c99_vectordb_spark.queries_ext import (
        LSH_DIM,
        LSH_PLANES,
        RECALL_K,
        RECALL_N_Q,
    )

    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in embeddings.collect()}
    planes = [hyperplane(p, LSH_DIM) for p in range(LSH_PLANES)]

    def bucket(v):
        b = 0
        for p, pl in enumerate(planes):
            if sum(x * y for x, y in zip(v, pl)) >= 0:
                b |= 1 << p
        return b

    buck = {i: bucket(v) for i, v in vecs.items()}
    by_bucket = collections.defaultdict(list)
    for i, b in buck.items():
        by_bucket[b].append(i)

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(x * x for x in v))
        return round(d / (nu * nv), 4)

    qids = [q for q in range(RECALL_N_Q) if q in vecs]

    def topk(qid, cand_ids):
        scored = sorted(
            ((-cos(vecs[i], vecs[qid]), i) for i in cand_ids if i != qid)
        )[:RECALL_K]
        return [i for _, i in scored]

    truth = {q: set(topk(q, vecs)) for q in qids}

    def metrics(multiprobe):
        ap_sum = rr_sum = 0
        for q in qids:
            probes = {buck[q]}
            if multiprobe:
                probes |= {buck[q] ^ (1 << p) for p in range(LSH_PLANES)}
            cand = [i for b in probes for i in by_bucket.get(b, [])]
            ranked = topk(q, cand)
            cum = 0
            ap = 0
            rr = 0
            for j, i in enumerate(ranked, 1):
                if i in truth[q]:
                    cum += 1
                    ap += (1_000_000 * cum) // j
                    if rr == 0:
                        rr = 1_000_000 // j
            ap_sum += ap // RECALL_K
            rr_sum += rr
        return ap_sum // RECALL_N_Q, rr_sum // RECALL_N_Q

    got = {r.tier: (r.map_ppm, r.mrr_ppm) for r in w8.q_sim_eval_map(spark, sf_dir).collect()}
    assert got["lsh"] == metrics(False)
    assert got["lsh_multiprobe"] == metrics(True)


def test_stickiness_recount(spark, sf_dir):
    import collections
    import datetime as dt

    import pandas as pd

    rows = {r.day: r.asDict() for r in w8.q_events_stickiness(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ud = {(int(u), d) for u, d in zip(ev.user_id, ev.ts.dt.date)}
    days = sorted({d for _, d in ud})
    by_day = collections.defaultdict(set)
    for u, d in ud:
        by_day[d].add(u)
    for d in days:
        r = rows[d.strftime("%Y-%m-%d")]
        dau = len(by_day[d])
        wau = len({u for k in range(7) for u in by_day.get(d - dt.timedelta(days=k), ())})
        mau = len({u for k in range(28) for u in by_day.get(d - dt.timedelta(days=k), ())})
        assert (r["dau"], r["wau"], r["mau"]) == (dau, wau, mau)
        assert r["dau_wau_ppm"] == (1_000_000 * dau) // wau
        assert r["dau_mau_ppm"] == (1_000_000 * dau) // mau
    assert set(rows) == {d.strftime("%Y-%m-%d") for d in days}


def test_generalize_sweep_recount(spark, sf_dir):
    import pandas as pd

    rows = {
        r.width_cents: r.asDict()
        for r in w8.q_anonymize_generalize_sweep(spark, sf_dir).collect()
    }
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cents = (c.c_acctbal * 100).round().astype("int64")
    passing = []
    for w in w8._GEN_WIDTHS:
        b = cents // w  # python floors, matching the column-divisor twin
        cls = pd.DataFrame({"n": c.c_nationkey, "b": b}).groupby(["n", "b"]).size()
        below = int(cls[cls < w8._KANON_K].sum())
        r = rows[w]
        assert r["n_classes"] == len(cls)
        assert r["k_min"] == int(cls.min())
        assert r["rows_below_k"] == below
        assert r["at_risk_ppm"] == (1_000_000 * below) // len(c)
        if r["at_risk_ppm"] <= w8._GEN_RISK_PPM:
            passing.append(w)
    chosen = [w for w, r in rows.items() if r["chosen"] == 1]
    assert chosen == ([min(passing)] if passing else [])


def test_ab_power_recount(spark, sf_dir):
    import pandas as pd

    rows = {
        (r.event_type, r.mde_ppm): r.asDict()
        for r in w8.q_events_ab_power(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    days = (int(us.max()) - int(us.min())) // 86_400_000_000 + 1
    cents = (ev.value * 100).round().astype("int64")
    for typ, g in cents.groupby(ev.event_type):
        n = len(g)
        s = int(g.sum())
        q = sum(int(v) ** 2 for v in g)
        var = (q - s * s / n) / (n - 1)
        mean = s / n
        for mde in w8._POWER_MDE_PPM:
            r = rows[(typ, mde)]
            delta = mean * mde / 1_000_000
            n_arm = math.ceil(2 * w8._POWER_ZSUM_SQ * var / (delta * delta))
            assert r["n_observed"] == n
            assert r["metric_mean"] == pytest.approx(mean / 100, abs=1e-4)
            assert r["metric_sd"] == pytest.approx(math.sqrt(var) / 100, abs=1e-4)
            assert r["n_per_arm"] == n_arm
            assert r["days_needed"] == math.ceil(2 * n_arm / (n / days))
    # power monotonicity: bigger MDE -> smaller n
    for typ in ev.event_type.unique():
        ns = [rows[(typ, m)]["n_per_arm"] for m in w8._POWER_MDE_PPM]
        assert ns == sorted(ns, reverse=True)


def test_assortativity_recount(spark, sf_dir):
    import collections

    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"create view {t} as select * from"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    ed = con.execute(
        "SELECT 2*o_custkey, 2*l_suppkey+1 FROM lineitem JOIN orders"
        " ON l_orderkey=o_orderkey GROUP BY 1,2"
        " HAVING COUNT(DISTINCT l_orderkey) >= 3"
    ).fetchall()
    deg = collections.Counter()
    for s_, d_ in ed:
        deg[s_] += 1
        deg[d_] += 1
    du = [deg[s_] for s_, d_ in ed] + [deg[d_] for s_, d_ in ed]
    dv = [deg[d_] for s_, d_ in ed] + [deg[s_] for s_, d_ in ed]
    n = len(du)
    sx, sy = sum(du), sum(dv)
    sxy = sum(a * b for a, b in zip(du, dv))
    sxx = sum(a * a for a in du)
    syy = sum(b * b for b in dv)
    r = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    row = w8.q_graph_assortativity(spark, sf_dir).collect()[0]
    assert row.n_nodes == len(deg)
    assert row.n_edges == len(ed)
    assert row.assortativity == pytest.approx(r, abs=1e-4)


def test_hill_tail_recount(spark, sf_dir):
    import pandas as pd

    row = w8.q_lineitem_hill_tail(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["cents"] = (li.l_extendedprice * 100).round().astype("int64")
    top = li.sort_values(
        ["cents", "l_orderkey", "l_linenumber"],
        ascending=[False, True, True],
    ).head(w8._HILL_K + 1)
    arr = sorted(top.cents.tolist(), reverse=True)
    xk1 = arr[w8._HILL_K]
    sum_exc = sum((x << 20) // xk1 - (1 << 20) for x in arr[: w8._HILL_K])
    assert row.xk1_cents == xk1
    assert row.sum_excess_q20 == sum_exc
    assert row.alpha_ppm == (w8._HILL_K * (1 << 20) * 1_000_000) // sum_exc
    # and the ratio-excess form tracks the true ln-based Hill closely;
    # e >= ln(1+e) makes the bias ONE-SIDED (reads low), O(mean excess)
    alpha_ln = w8._HILL_K / sum(
        math.log(x / xk1) for x in arr[: w8._HILL_K]
    )
    assert row.alpha_ppm / 1e6 <= alpha_ln * (1 + 1e-9)
    assert row.alpha_ppm / 1e6 == pytest.approx(alpha_ln, rel=1e-2)


def test_otsu_recount(spark, sf_dir, documents):
    """Full pure-Python Otsu replay from the shared pixel spec —
    independent of both the BMP codec path and the DuckDB oracle."""
    import collections

    from c99_vectordb_spark.operators.multimodal import gray_pixel_py

    got = {
        r.id: (r.n_pix, r.threshold, r.between_var_scaled, r.fg_share_ppm)
        for r in w8.q_multimodal_otsu(spark, sf_dir).collect()
    }
    for r in documents.collect():
        n = max(16, len(r.text or ""))
        pix = [gray_pixel_py(r.doc_id, k) for k in range(n)]
        cnt = collections.Counter(pix)
        s = sum(pix)
        best = None
        n0 = s0 = 0
        for b in sorted(cnt):
            n0 += cnt[b]
            s0 += b * cnt[b]
            if n0 >= n:
                continue
            f = (s0 * n - n0 * s) ** 2 // (n0 * (n - n0))
            key = (-f, b)
            if best is None or key < best[0]:
                best = (key, b, f, n0)
        _k, t, f, n0b = best
        assert got[r.doc_id] == (n, t, f, (1_000_000 * (n - n0b)) // n)
        # binarization sanity: the threshold separates the two modes
        lo = [p for p in pix if p <= t]
        hi = [p for p in pix if p > t]
        if lo and hi:
            assert max(lo) <= t < min(hi)


def test_tcloseness_recount(spark, sf_dir):
    import collections

    import pandas as pd

    rep = {
        r.c_nationkey: (r.n_classes, r.t_max_ppm, r.classes_above_t)
        for r in w8.q_anonymize_tcloseness(spark, sf_dir).collect()
    }
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cents = (c.c_acctbal * 100).round().astype("int64")
    b = cents // w8._TCLOSE_WIDTH
    nn = len(c)
    g = collections.Counter(c.c_mktsegment)
    per_nation = collections.defaultdict(list)
    cls = collections.defaultdict(collections.Counter)
    for nk, bb, s in zip(c.c_nationkey, b, c.c_mktsegment):
        cls[(int(nk), int(bb))][s] += 1
    for (nk, bb), cnt in cls.items():
        k = sum(cnt.values())
        num = sum(abs(cnt.get(s, 0) * nn - gs * k) for s, gs in g.items())
        per_nation[nk].append((1_000_000 * num) // (2 * k * nn))
    for nk, ts in per_nation.items():
        assert rep[nk] == (
            len(ts),
            max(ts),
            sum(1 for t in ts if t > w8._TCLOSE_T_PPM),
        )
    # t-closeness is scale-free in the class: t in [0, 1e6]
    assert all(0 <= t <= 1_000_000 for ts in per_nation.values() for t in ts)


def test_price_index_recount(spark, sf_dir):
    import collections
    import math as _m

    import pandas as pd

    rows = {
        r.m0: (r.n_parts, r.laspeyres_ppm, r.paasche_ppm, r.fisher_ppm)
        for r in w8.q_lineitem_price_index(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    m = li.l_shipdate.dt.year * 12 + li.l_shipdate.dt.month
    c = (li.l_extendedprice * 100).round().astype("int64")
    q = li.l_quantity.round().astype("int64")
    pm = collections.defaultdict(lambda: [0, 0])
    for p, mm, cc, qq in zip(li.l_partkey, m, c, q):
        cell = pm[(int(p), int(mm))]
        cell[0] += int(cc)
        cell[1] += int(qq)
    uv = {k: (1_000_000 * v[0]) // v[1] for k, v in pm.items()}
    sums = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for (p, mm), u0 in uv.items():
        nxt = uv.get((p, mm + 1))
        if nxt is None:
            continue
        q0 = pm[(p, mm)][1]
        q1 = pm[(p, mm + 1)][1]
        s = sums[mm]
        s[0] += 1
        s[1] += nxt * q0
        s[2] += u0 * q0
        s[3] += nxt * q1
        s[4] += u0 * q1
    for mm, (n, ln_, ld, pn, pd_) in sums.items():
        lasp = (1_000_000 * ln_) // ld
        paas = (1_000_000 * pn) // pd_
        fisher = int(_m.floor(_m.sqrt(float(lasp) * float(paas))))
        assert rows[mm] == (n, lasp, paas, fisher)
    assert set(rows) == set(sums)
