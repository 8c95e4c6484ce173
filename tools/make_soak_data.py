#!/usr/bin/env python
"""Generate the sf1 scale-soak dataset (round-6 verdict item #5).

10x deterministic replication of /root/testdata/sf0.1 into
<repo>/testdata_sf1 (gitignored): replica i offsets every key space by
i * (max_key + 1) so referential integrity holds exactly (orders join
their replica's customers, lineitems their replica's orders/parts/
suppliers, events their replica's users). region/nation stay fixed
dimensions. documents/embeddings replicate byte-identically on
offset doc_ids — deliberately: a 90%-duplicated corpus is the
realistic web-crawl shape, so the dedup/ANN tier gets soaked on
dense duplicate clusters (10 per document) instead of a uniform
no-dup fantasy.

PERF/SOAK DATA ONLY — correctness stays gated on the driver's
/root/testdata scales; nothing here feeds an oracle comparison row.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SOAK_SRC", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.environ.get("SOAK_DST", os.path.join(REPO, "testdata_sf1"))
COPIES = int(os.environ.get("SOAK_COPIES", "10"))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def base(table: str, key: str) -> int:
        return con.sql(
            f"SELECT MAX({key}) + 1 FROM {src(table)}"
        ).fetchone()[0]

    cust_b = base("customer", "c_custkey")
    supp_b = base("supplier", "s_suppkey")
    part_b = base("part", "p_partkey")
    ord_b = base("orders", "o_orderkey")
    doc_b = base("documents", "doc_id")
    ev_b = base("events", "event_id")
    user_b = con.sql(f"SELECT MAX(user_id) + 1 FROM {src('events')}").fetchone()[0]
    vec_b = base("embeddings", "vec_id")

    plans = {
        "region": None,  # fixed dims: copy through
        "nation": None,
        "customer": f"""
            SELECT c_custkey + i * {cust_b} AS c_custkey,
                   * EXCLUDE (c_custkey)
            FROM {src('customer')} CROSS JOIN range({COPIES}) r(i)""",
        "supplier": f"""
            SELECT s_suppkey + i * {supp_b} AS s_suppkey,
                   * EXCLUDE (s_suppkey)
            FROM {src('supplier')} CROSS JOIN range({COPIES}) r(i)""",
        "part": f"""
            SELECT p_partkey + i * {part_b} AS p_partkey,
                   * EXCLUDE (p_partkey)
            FROM {src('part')} CROSS JOIN range({COPIES}) r(i)""",
        "orders": f"""
            SELECT o_orderkey + i * {ord_b} AS o_orderkey,
                   o_custkey + i * {cust_b} AS o_custkey,
                   * EXCLUDE (o_orderkey, o_custkey)
            FROM {src('orders')} CROSS JOIN range({COPIES}) r(i)""",
        "lineitem": f"""
            SELECT l_orderkey + i * {ord_b} AS l_orderkey,
                   l_partkey + i * {part_b} AS l_partkey,
                   l_suppkey + i * {supp_b} AS l_suppkey,
                   * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
            FROM {src('lineitem')} CROSS JOIN range({COPIES}) r(i)""",
        "events": f"""
            SELECT event_id + i * {ev_b} AS event_id,
                   user_id + i * {user_b} AS user_id,
                   * EXCLUDE (event_id, user_id)
            FROM {src('events')} CROSS JOIN range({COPIES}) r(i)""",
        "documents": f"""
            SELECT doc_id + i * {doc_b} AS doc_id,
                   * EXCLUDE (doc_id)
            FROM {src('documents')} CROSS JOIN range({COPIES}) r(i)""",
        "embeddings": f"""
            SELECT vec_id + i * {vec_b} AS vec_id,
                   * EXCLUDE (vec_id)
            FROM {src('embeddings')} CROSS JOIN range({COPIES}) r(i)""",
    }
    for table, sql in plans.items():
        out = os.path.join(DST, f"{table}.parquet")
        q = sql or f"SELECT * FROM {src(table)}"
        con.sql(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows -> {out}", file=sys.stderr)
    print(DST)


if __name__ == "__main__":
    main()
