"""Round-7 wave: pure-Python recounts of the four new operators,
independent of both the Spark plans and the DuckDB twins (the oracle
proves cross-engine consistency; these prove the algorithms)."""

from __future__ import annotations

import collections
import re

import pandas as pd


def test_shard_bytes_serpentine_recount(spark, sf_dir):
    from c99_vectordb_spark.queries_wave9 import _N_SHARDS, q_corpus_shard_bytes

    rows = {r["shard"]: r for r in q_corpus_shard_bytes(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sized = sorted(
        (
            (len((t or "").encode("utf-8")), int(d))
            for d, t in zip(docs["doc_id"], docs["text"])
        ),
        key=lambda p: (-p[0], p[1]),
    )
    agg = collections.defaultdict(lambda: [0, 0])
    for rk0, (b, _) in enumerate(sized):
        k = rk0 % (2 * _N_SHARDS)
        shard = k if k < _N_SHARDS else 2 * _N_SHARDS - 1 - k
        agg[shard][0] += 1
        agg[shard][1] += b
    total = sum(v[1] for v in agg.values())
    assert set(rows) == set(agg)
    for shard, (n, b) in agg.items():
        assert rows[shard]["n_docs"] == n
        assert rows[shard]["shard_bytes"] == b
        assert rows[shard]["share_ppm"] == (1_000_000 * b) // total
    # the balancing law: every shard within one max-document of ideal
    max_doc = sized[0][0]
    ideal = total / _N_SHARDS
    for _, b in agg.values():
        assert abs(b - ideal) <= max_doc + _N_SHARDS


def test_stratified_quota_recount(spark, sf_dir):
    from c99_vectordb_spark.queries_wave9 import _SPLITS, q_corpus_stratified_quota

    rows = q_corpus_stratified_quota(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    strata = docs.groupby(["lang", "source"]).size().to_dict()
    expect = {}
    for (lang, source), n in strata.items():
        cells = []
        for idx, split, p in _SPLITS:
            base, rem = divmod(n * p, 1_000_000)
            cells.append([idx, split, base, rem])
        leftover = n - sum(c[2] for c in cells)
        for rk, c in enumerate(
            sorted(cells, key=lambda c: (-c[3], c[0])), start=1
        ):
            if rk <= leftover:
                c[2] += 1
        for idx, split, alloc, _ in cells:
            expect[(lang, source, split)] = (n, alloc)
    assert len(rows) == len(expect)
    for r in rows:
        n, alloc = expect[(r["lang"], r["source"], r["split"])]
        assert (r["n_stratum"], r["alloc"]) == (n, alloc)
    # the Hamilton invariant: allocations sum to n exactly, per stratum
    per_stratum = collections.Counter()
    for r in rows:
        per_stratum[(r["lang"], r["source"])] += r["alloc"]
    for (lang, source), n in strata.items():
        assert per_stratum[(lang, source)] == n


def test_retention_triangle_recount(spark, sf_dir):
    from c99_vectordb_spark.queries_wave9 import (
        _RETENTION_MAX_OFFSET,
        _WEEK_US,
        q_events_retention_triangle,
    )

    rows = q_events_retention_triangle(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # normalize to MICROseconds like normalize_event_time: a
    # ns-resolution parquet fixture would otherwise compute week ids
    # 1000x off (r7 advice — the old `* 1` was a no-op in both arms)
    us = ev["ts"].astype("int64") // (
        1 if ev["ts"].dtype == "datetime64[us]" else 1000
    )
    weeks = us // _WEEK_US
    uw = set(zip(ev["user_id"], weeks))
    cohort = {}
    for u, w in uw:
        cohort[u] = min(cohort.get(u, w), w)
    sizes = collections.Counter(cohort.values())
    cells = collections.Counter(
        (cohort[u], w - cohort[u]) for u, w in uw if w - cohort[u] <= _RETENTION_MAX_OFFSET
    )
    assert len(rows) == len(cells)
    for r in rows:
        key = (r["cohort_week"], r["offset_weeks"])
        assert cells[key] == r["n_active"]
        assert sizes[r["cohort_week"]] == r["cohort_size"]
        assert r["retained_ppm"] == (1_000_000 * cells[key]) // sizes[r["cohort_week"]]
        if r["offset_weeks"] == 0:
            assert r["retained_ppm"] == 1_000_000


def test_readability_recount(spark, sf_dir):
    from c99_vectordb_spark.queries_wave9 import q_text_readability

    rows = {r["doc_id"]: r for r in q_text_readability(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    seen = 0
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        text = text or ""
        w = len(re.findall(r"[a-z0-9_]+", text.lower()))
        if w == 0:
            assert doc_id not in rows
            continue
        seen += 1
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        r = rows[doc_id]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (w, s, y)
        assert r["fre_milli"] == 206835 - (1015 * w) // s - (84600 * y) // w
    assert seen == len(rows)


def test_holt_winters_tracks_float_reference(spark, sf_dir):
    """The integer-truncating recurrence must track a FLOAT
    Holt-Winters with the same init and updates: truncation loses
    under one cent per smoothing step per term, so after the ~70-step
    series the forecasts agree to far better than a basis point of
    the level. Independent of both engine twins (which replay the
    integer spec exactly against each other)."""
    from c99_vectordb_spark.queries_wave9 import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_GAMMA,
        _HW_HORIZON,
        _HW_PERIOD,
        q_orders_holt_winters,
    )

    rows = q_orders_holt_winters(spark, sf_dir).collect()
    assert len(rows) == _HW_HORIZON

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.assign(
            mid=orders["o_orderdate"].dt.year * 12
            + orders["o_orderdate"].dt.month
            - 1,
            cents=(orders["o_totalprice"] * 100).round().astype("int64"),
        )
        .groupby("mid")["cents"]
        .sum()
        .sort_index()
    )
    xs = [float(v) for v in monthly.values]
    m = _HW_PERIOD
    al, be, ga = _HW_ALPHA / 10, _HW_BETA / 10, _HW_GAMMA / 10
    lvl = sum(xs[:m]) / m
    b = (sum(xs[m : 2 * m]) - sum(xs[:m])) / (m * m)
    s = [x - lvl for x in xs[:m]]
    for x in xs[m:]:
        sm, lp = s[0], lvl
        lvl = al * (x - sm) + (1 - al) * (lp + b)
        b = be * (lvl - lp) + (1 - be) * b
        s = s[1:] + [ga * (x - lvl) + (1 - ga) * sm]
    last_mid = int(monthly.index[-1])
    for r in rows:
        h = r["h"]
        ref = lvl + h * b + s[(h - 1) % m]
        assert r["month_index"] == last_mid + h
        assert abs(r["forecast_cents"] - ref) <= max(1e-4 * abs(ref), 200), (
            h, r["forecast_cents"], ref,
        )


def test_stream_retention_matches_batch(spark, tmp_path):
    """Two micro-batches through the distinct-(user, week) partial
    stream, merged by distinct-union, must yield the IDENTICAL
    triangle as the batch rollup on the full replay — including a
    late event in batch 2 that moves user 1's cohort a week earlier
    (the merge must re-derive cohorts, not patch them)."""
    import datetime as dt
    import os
    import time as _t

    from c99_vectordb_spark.queries_wave9 import (
        retention_triangle_from_user_weeks,
    )
    from c99_vectordb_spark.streaming.ingest import stream_retention_weeks

    def ev(i, day, uid):
        return (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=day), uid,
                "view", 0.0, "{}")

    b1 = [ev(1, 7, 1), ev(2, 8, 1), ev(3, 14, 1), ev(4, 7, 2), ev(5, 21, 2)]
    # late arrival: user 1 was ALSO active in week 0 — cohort moves
    b2 = [ev(6, 0, 1), ev(7, 28, 2), ev(8, 0, 3), ev(9, 14, 3)]
    schema = ("event_id LONG, ts TIMESTAMP, user_id LONG,"
              " event_type STRING, value DOUBLE, props STRING")
    src = str(tmp_path / "src")
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

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = stream_retention_weeks(
        stream, sink, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    assert len(states) >= 2, "expected multiple micro-batches"

    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    merged = merged.distinct()
    got = sorted(
        map(tuple, retention_triangle_from_user_weeks(merged).collect())
    )
    full = spark.createDataFrame(b1 + b2, schema)
    from c99_vectordb_spark.functions.text import normalize_event_time
    from c99_vectordb_spark.queries_wave9 import _WEEK_US

    batch_uw = (
        normalize_event_time(full)
        .selectExpr("user_id", f"ts_us div {_WEEK_US} AS week")
        .distinct()
    )
    expect = sorted(
        map(tuple, retention_triangle_from_user_weeks(batch_uw).collect())
    )
    assert got == expect
    # the late event really moved user 1's cohort: week-0 cohort has 2 users
    by_key = {(r[0], r[1]): r for r in got}
    zero_cohort = min(k[0] for k in by_key)
    assert by_key[(zero_cohort, 0)][3] == 2  # cohort_size: users 1 and 3
