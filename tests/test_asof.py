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


def test_asof_null_valued_match_yields_null_not_older_value(spark):
    """A matched right row whose value IS NULL must produce NULL — not
    carry forward an older non-null value (DuckDB ASOF semantics)."""
    left = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 3, 1))], "event_id LONG, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), 50), ("k", dt.datetime(2024, 2, 1), None)],
        "k STRING, ots TIMESTAMP, oid LONG",
    )
    out = asof_join(left, right, "k", "ts", "ots", "oid").collect()
    assert out[0].oid is None


def test_asof_left_columns_may_collide_with_internal_names(spark):
    """Caller-owned _k/_t/_side/_rs columns must survive untouched."""
    left = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 2, 1), "keep-k", "keep-t", "keep-s", "keep-r")],
        "event_id LONG, k STRING, ts TIMESTAMP, _k STRING, _t STRING, _side STRING, _rs STRING",
    )
    right = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), 7)], "k STRING, ots TIMESTAMP, oid LONG"
    )
    row = asof_join(left, right, "k", "ts", "ots", "oid").collect()[0]
    assert row.oid == 7
    assert (row._k, row._t, row._side, row._rs) == ("keep-k", "keep-t", "keep-s", "keep-r")
