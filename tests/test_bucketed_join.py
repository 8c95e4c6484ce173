"""Prove the SCALE.md bucketing claim locally: a fact-fact join over
two tables bucketed on the join key runs with NO Exchange (shuffle) on
either side — the physical property that kills the only corpus-sized
shuffle in the TPC-H order/lineitem joins at 100 TB. Bucketed
saveAsTable works in local mode with a temp warehouse, so the claim is
testable, not just documented."""
from __future__ import annotations

import os
import re
import tempfile

import pytest


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    tmp = tempfile.TemporaryDirectory()
    db = "bucket_proof"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{os.path.join(tmp.name, db)}'"
    )
    n_buckets = 4
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(f"{db}.orders_b")
    )
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(f"{db}.lineitem_b")
    )
    yield db
    spark.sql(f"DROP DATABASE {db} CASCADE")
    tmp.cleanup()


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Both sides bucketed on the join key into the same bucket count:
    the join plan must contain NO Exchange — reading pre-bucketed data
    satisfies the join's distribution requirement directly."""
    db = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(f"{db}.orders_b").join(
            spark.table(f"{db}.lineitem_b"),
            spark.table(f"{db}.orders_b").o_orderkey
            == spark.table(f"{db}.lineitem_b").l_orderkey,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        n = j.count()
        want = (
            spark.read.parquet(
                os.path.dirname(spark.table(f"{db}.orders_b").inputFiles()[0])
            )
            .count()
        )
        assert n > 0 and n >= want  # every order has >= 1 lineitem here
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    """A groupBy on the bucket key also needs no shuffle: partial and
    final aggregation collapse into one stage over the bucketed read."""
    db = bucketed
    agg = (
        spark.table(f"{db}.lineitem_b")
        .groupBy("l_orderkey")
        .count()
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() > 0


def test_unbucketed_join_shuffles_as_control(spark, sf_dir):
    """Control: the same join over plain parquet reads DOES shuffle —
    the absence above is the bucketing, not a planner quirk."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = o.join(li, o.o_orderkey == li.l_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
