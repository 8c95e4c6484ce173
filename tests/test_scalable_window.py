"""Two-pass range-partition stitch (operators/scalable_window).

Covers the round-5 changes: the prefix ships as a broadcast join above
_PREFIX_LITERAL_MAX partitions (janino codegen ceiling), and pre_range
is idempotent so composing several stitched ops over one order costs a
single shuffle + localCheckpoint.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.operators import scalable_window as sw


@pytest.fixture(scope="module")
def nums(spark):
    # deterministic, shuffled-ish order with ties in v
    return spark.range(0, 500).select(
        F.col("id"),
        ((F.col("id") * 37) % 101).alias("k"),
        ((F.col("id") * 13) % 50).alias("v"),
    )


def _norm(df):
    """Sort by id, widen ints to int64 (stitch emits long where the SQL
    window emits int; values must still be identical)."""
    df = df.sort_values("id").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df


def test_global_rank_matches_sql_window(spark, nums):
    got = _norm(sw.global_rank(nums, [F.col("k"), F.col("id")]).toPandas())
    exp = _norm(
        nums.selectExpr(
            "id", "k", "v", "row_number() over (order by k, id) as rank"
        ).toPandas()
    )[list(got.columns)]
    assert got.equals(exp)


def test_running_sum_and_max_match_sql_window(spark, nums):
    got_s = sw.running_sum(nums, [F.col("k"), F.col("id")], F.col("v")).toPandas()
    exp_s = nums.selectExpr(
        "id", "k", "v",
        "sum(v) over (order by k, id rows unbounded preceding) as runsum",
    ).toPandas()
    got_m = sw.running_max(nums, [F.col("k"), F.col("id")], F.col("v")).toPandas()
    exp_m = nums.selectExpr(
        "id", "k", "v",
        "max(v) over (order by k, id rows unbounded preceding) as runmax",
    ).toPandas()
    for got, exp in ((got_s, exp_s), (got_m, exp_m)):
        got = _norm(got)
        exp = _norm(exp)[list(got.columns)]
        assert got.equals(exp)


@pytest.fixture()
def no_coalesce(spark):
    """At toy scale AQE coalesces the range shuffle to ONE partition and
    the prefix is empty — keep the 8 range partitions so the prefix path
    under test actually runs."""
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    yield
    spark.conf.set(key, old)


def test_broadcast_prefix_path_equals_literal_path(
    spark, nums, monkeypatch, no_coalesce
):
    """Force every prefix through the broadcast-join branch and demand
    bit-identical results with the create_map branch."""
    order = [F.col("k"), F.col("id")]
    lit_rank = _norm(sw.global_rank(nums, order).toPandas())
    lit_sum = _norm(sw.running_sum(nums, order, F.col("v")).toPandas())
    lit_max = _norm(sw.running_max(nums, order, F.col("v")).toPandas())
    monkeypatch.setattr(sw, "_PREFIX_LITERAL_MAX", 0)
    bj_rank = _norm(sw.global_rank(nums, order).toPandas())
    bj_sum = _norm(sw.running_sum(nums, order, F.col("v")).toPandas())
    bj_max = _norm(sw.running_max(nums, order, F.col("v")).toPandas())
    for lit, bj in ((lit_rank, bj_rank), (lit_sum, bj_sum), (lit_max, bj_max)):
        assert lit.equals(bj[list(lit.columns)])


def test_broadcast_prefix_plan_has_broadcast_join(
    spark, nums, monkeypatch, no_coalesce
):
    monkeypatch.setattr(sw, "_PREFIX_LITERAL_MAX", 0)
    df = sw.running_sum(nums, [F.col("k"), F.col("id")], F.col("v"))
    assert df.count() == 500  # materialize through AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_pre_range_is_idempotent(spark, nums):
    """Second pre_range over an already-ranged frame is a no-op, so two
    stitched ops in one plan share ONE shuffle + ONE localCheckpoint."""
    ranged = sw.pre_range(nums, [F.col("k"), F.col("id")])
    assert sw.pre_range(ranged, [F.col("k"), F.col("id")]) is ranged


def test_composed_ops_share_one_checkpoint(spark, nums):
    order = [F.col("k"), F.col("id")]
    ranged = sw.pre_range(nums, order)
    # both ops consume the SAME checkpointed frame; outputs keep __sw_pid
    # (caller-managed) and must agree with independent runs
    a = sw.global_rank(ranged, order)
    b = sw.running_sum(ranged, order, F.col("v"))
    assert sw._PID in a.columns and sw._PID in b.columns
    joined = _norm(a.join(b.select("id", "runsum"), "id").drop(sw._PID).toPandas())
    solo = _norm(
        sw.running_sum(sw.global_rank(nums, order), order, F.col("v")).toPandas()
    )[list(joined.columns)]
    assert joined.equals(solo)
    # the composed plans re-scan the one checkpointed RDD, not two
    pa = a._jdf.queryExecution().executedPlan().toString()
    pb = b._jdf.queryExecution().executedPlan().toString()
    assert pa.count("Exchange rangepartitioning") == 0
    assert pb.count("Exchange rangepartitioning") == 0


def test_exact_quantiles_disc_semantics(spark):
    from pyspark.sql import functions as F

    from c99_vectordb_spark.operators.scalable_window import exact_quantiles

    # values 10..100 step 10 (n=10): p50 -> rank (9*50)//100+1 = 5 -> 50
    df = spark.createDataFrame([(i, i * 10) for i in range(1, 11)], "id LONG, v LONG")
    out = {
        r.p: r.v
        for r in exact_quantiles(
            df, [F.asc("v"), F.asc("id")], [0, 50, 100]
        ).collect()
    }
    assert out == {0: 10, 50: 50, 100: 100}


def test_exact_quantiles_empty_input(spark):
    from pyspark.sql import functions as F

    from c99_vectordb_spark.operators.scalable_window import exact_quantiles

    df = spark.createDataFrame([], "id LONG, v LONG")
    assert exact_quantiles(df, [F.asc("v"), F.asc("id")], [50]).count() == 0
