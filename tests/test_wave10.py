"""Wave-10 operators (round 8): grouping sets, Merkle-bucket diff,
rendezvous sharding. Each gets an INDEPENDENT pure-Python replay from
the raw parquet (hashlib md5, plain dicts — no shared helpers), the
replay-independent discipline of tests/test_replay_independent.py:
the DuckDB oracles prove Spark==DuckDB; these prove the shared spec
is the published algorithm, not a twinned mistake.
"""

from __future__ import annotations

import collections
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.01"


def _md5_56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def test_grouping_sets_replay(spark):
    from c99_vectordb_spark.queries_wave10 import q_orders_grouping_sets

    rows = [r.asDict() for r in q_orders_grouping_sets(spark, SF).collect()]
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    yr = orders["o_orderdate"].dt.year.astype(int)
    cents = (orders["o_totalprice"] * 100 + 0.5).astype("int64")
    agg: dict = collections.defaultdict(lambda: [0, 0])
    for y, p, c in zip(yr, orders["o_orderpriority"], cents):
        for key in ((y, p, 0), (y, "ALL", 1), (-1, "ALL", 3)):
            agg[key][0] += 1
            agg[key][1] += int(c)
    expect = [
        {
            "yr": k[0],
            "priority": k[1],
            "lvl": k[2],
            "n_orders": v[0],
            "revenue_cents": v[1],
        }
        for k, v in agg.items()
    ]
    got = sorted(rows, key=lambda r: (r["lvl"], r["yr"], r["priority"]))
    expect = sorted(expect, key=lambda r: (r["lvl"], r["yr"], r["priority"]))
    assert got == expect
    # every grouping level is populated and the grand total is one row
    assert sum(1 for r in rows if r["lvl"] == 3) == 1
    leaf_n = sum(r["n_orders"] for r in rows if r["lvl"] == 0)
    assert leaf_n == len(orders)


def test_merkle_diff_replay_and_consistency(spark):
    from c99_vectordb_spark.queries_wave10 import (
        _MERKLE_BUCKETS,
        q_docs_merkle_diff,
    )

    rows = {r["bucket"]: r.asDict() for r in q_docs_merkle_diff(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def side(new: bool):
        n = collections.Counter()
        x = collections.defaultdict(int)
        for did, text in zip(docs["doc_id"], docs["text"]):
            did = int(did)
            if new:
                if did % 3 == 0:
                    continue
                body = text[:40] if did % 7 == 0 else text
            else:
                if did % 5 == 0:
                    continue
                body = text
            b = _md5_56(str(did)) % _MERKLE_BUCKETS
            n[b] += 1
            x[b] ^= _md5_56(f"{did}:{body}")
        return n, x

    n_old, x_old = side(False)
    n_new, x_new = side(True)
    for b in set(n_old) | set(n_new):
        r = rows[b]
        assert r["n_old"] == n_old.get(b, 0)
        assert r["n_new"] == n_new.get(b, 0)
        assert r["xor_old"] == x_old.get(b, 0)
        assert r["xor_new"] == x_new.get(b, 0)
        assert r["dirty"] == int(
            n_old.get(b, 0) != n_new.get(b, 0) or x_old.get(b, 0) != x_new.get(b, 0)
        )
    # cross-operator consistency: a bucket is clean iff NO doc with a
    # non-'unchanged' snapshot_diff status hashes into it
    from c99_vectordb_spark.queries_ext import q_corpus_snapshot_diff

    changed_buckets = {
        _md5_56(str(r["doc_id"])) % _MERKLE_BUCKETS
        for r in q_corpus_snapshot_diff(spark, SF).collect()
        if r["status"] != "unchanged"
    }
    for b, r in rows.items():
        assert bool(r["dirty"]) == (b in changed_buckets)


def test_rendezvous_replay_and_movement_bound(spark):
    from c99_vectordb_spark.queries_wave10 import (
        _HRW_SHARDS,
        q_corpus_rendezvous_shards,
    )

    rows = {r["shard"]: r.asDict() for r in q_corpus_rendezvous_shards(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    s1 = _HRW_SHARDS

    occ = collections.Counter()
    chars = collections.Counter()
    moved = collections.Counter()
    n_moved_total = 0
    for did, nc in zip(docs["doc_id"], docs["n_chars"]):
        did = int(did)
        hs = [(_md5_56(f"{did}:{s}"), -s) for s in range(s1 + 1)]
        old = -max(hs[:s1])[1]
        new = -max(hs)[1]
        occ[new] += 1
        chars[new] += int(nc)
        if new != old:
            moved[new] += 1
            n_moved_total += 1
    for s in range(s1 + 1):
        r = rows[s]
        assert r["n_docs"] == occ[s]
        assert r["sum_chars"] == chars[s]
        assert r["n_moved"] == moved[s]
    # the HRW property: growth moves only docs won by the NEW shard,
    # so every move lands on shard s1 and totals ~1/(s1+1) of the corpus
    assert all(rows[s]["n_moved"] == 0 for s in range(s1))
    assert rows[s1]["n_moved"] == rows[s1]["n_docs"] == n_moved_total
    frac = n_moved_total / len(docs)
    assert 0.04 < frac < 0.25  # expected 1/9 ~ 0.11 with sampling slack
