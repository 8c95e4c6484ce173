"""As-of join semantics (union-window merge technique)."""

from __future__ import annotations

import datetime as dt

from c99_vectordb_spark.operators.asof import asof_join


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", dt.datetime(2024, 1, 10)),
            (2, "k1", dt.datetime(2024, 1, 20)),
            (3, "k2", dt.datetime(2024, 1, 5)),
            (4, "k3", dt.datetime(2024, 1, 1)),  # no right rows at all
        ],
        "event_id LONG, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            ("k1", dt.datetime(2024, 1, 8), 100),
            ("k1", dt.datetime(2024, 1, 15), 200),
            ("k1", dt.datetime(2024, 1, 25), 300),  # after every left row
            ("k2", dt.datetime(2024, 1, 5), 400),  # exact-time match
        ],
        "k STRING, ots TIMESTAMP, oid LONG",
    )
    out = {
        r.event_id: r.oid
        for r in asof_join(left, right, "k", "ts", "ots", "oid").collect()
    }
    assert out[1] == 100  # latest right <= Jan10 is Jan8
    assert out[2] == 200  # Jan15 preferred over Jan8; Jan25 is in the future
    assert out[3] == 400  # equal timestamps match (inclusive)
    assert out[4] is None  # key with no right rows -> NULL


def test_asof_join_duplicate_right_times_deterministic(spark):
    left = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 2, 1))], "event_id LONG, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), 7), ("k", dt.datetime(2024, 1, 1), 9)],
        "k STRING, ots TIMESTAMP, oid LONG",
    )
    out = asof_join(left, right, "k", "ts", "ots", "oid").collect()
    assert out[0].oid == 9  # max value wins on same-(key,time) duplicates
