"""Deterministic sketches: CMS/KMV invariants and merge laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from c99_vectordb_spark.operators import sketches as SK
from c99_vectordb_spark.operators.corpus import vocab_counts


def test_cms_estimate_dominates_truth(spark, documents):
    """Count-Min never underestimates, and at this width it is exact
    for most heavy hitters."""
    sketch = SK.cms_build(documents, "text")
    probes = vocab_counts(documents, "doc_id", "text", top_n=30).select("token", "tf")
    est = SK.cms_estimate(sketch, probes, "token")
    rows = probes.join(est, "token").collect()
    assert len(rows) == 30
    assert all(r.cms_est >= r.tf for r in rows)


def test_cms_merges_additively(spark, documents):
    """sketch(A) + sketch(B) == sketch(A ∪ B) cell by cell — the
    map-side-combine property that makes the sketch a Spark aggregate."""
    a = documents.filter(F.col("doc_id") % 2 == 0)
    b = documents.filter(F.col("doc_id") % 2 == 1)
    merged = (
        SK.cms_build(a, "text")
        .unionByName(SK.cms_build(b, "text"))
        .groupBy("j", "col")
        .agg(F.sum("n").alias("n"))
    )
    full = SK.cms_build(documents, "text")
    diff = merged.join(full, ["j", "col"], "full").filter(
        F.coalesce(merged["n"], F.lit(0)) != F.coalesce(full["n"], F.lit(0))
    )
    assert diff.count() == 0


def test_kmv_estimate_paths(spark, documents):
    """Groups under k report exactly; groups over k report the KMV
    formula within a sane error band (deterministic, so the band is a
    fixed fact about this data, not a flaky tolerance)."""
    df = documents.select("lang", F.col("doc_id").cast("string").alias("v"))
    out = {r.grp: r for r in SK.kmv_distinct(df, "lang", "v").collect()}
    for grp, r in out.items():
        if r.n_distinct < SK.KMV_K:
            assert r.kmv_est == r.n_distinct, grp
        else:
            assert 0.5 * r.n_distinct <= r.kmv_est <= 2.0 * r.n_distinct, (
                grp,
                r.n_distinct,
                r.kmv_est,
            )


def test_kmv_merge_by_union(spark, documents):
    """KMV merges by unioning value sets — estimating the union of two
    shards equals estimating the whole."""
    df = documents.select("lang", F.col("doc_id").cast("string").alias("v"))
    a = df.filter(F.col("v").cast("long") % 2 == 0)
    b = df.filter(F.col("v").cast("long") % 2 == 1)
    merged = SK.kmv_distinct(a.unionByName(b), "lang", "v")
    full = SK.kmv_distinct(df, "lang", "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_cms_is_a_streaming_aggregate(spark, documents, tmp_path):
    """The sketch build is an ordinary groupBy aggregate, so it runs
    unchanged as a streaming complete-mode query — the final sketch
    equals the batch sketch cell for cell (mergeable partials are
    exactly what Structured Streaming maintains as state)."""
    import os

    src = str(tmp_path / "src")
    documents.select("doc_id", "text").coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
    q = (
        SK.cms_build(stream, "text")
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.j, r.col): r.n for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    want = {(r.j, r.col): r.n for r in SK.cms_build(documents, "text").collect()}
    assert got == want


def test_bottomk_quantiles_sample_and_accuracy(spark, sf_dir):
    from c99_vectordb_spark.operators.sketches import bottomk_quantiles

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority",
        (F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    out = bottomk_quantiles(
        orders, "o_orderpriority", "cents", "o_orderkey", k=64
    ).collect()
    rows = {r.grp: r for r in out}
    exact = {
        r.o_orderpriority: r.med
        for r in orders.groupBy("o_orderpriority")
        .agg(F.expr("percentile(cents, 0.5)").alias("med"))
        .collect()
    }
    for grp, r in rows.items():
        assert r.n_sample == min(64, r.n_total)
        assert r.p25 <= r.p50 <= r.p75
        # a 64-row uniform sample's median lands within the exact
        # group's IQR-scale band (loose: 35% relative)
        assert abs(r.p50 - exact[grp]) <= 0.35 * exact[grp]
    # deterministic: identical on re-run
    again = {
        r.grp: (r.p25, r.p50, r.p75)
        for r in bottomk_quantiles(
            orders, "o_orderpriority", "cents", "o_orderkey", k=64
        ).collect()
    }
    assert again == {g: (r.p25, r.p50, r.p75) for g, r in rows.items()}


def test_bottomk_quantiles_small_group_is_exact(spark):
    """A group smaller than k samples everything: the p50 rule then
    gives the exact lower-median of the group."""
    from c99_vectordb_spark.operators.sketches import bottomk_quantiles

    df = spark.createDataFrame(
        [("g", v, i) for i, v in enumerate([10, 20, 30, 40, 50])],
        "grp string, v long, id long",
    )
    r = bottomk_quantiles(df, "grp", "v", "id", k=256).collect()[0]
    assert (r.n_total, r.n_sample) == (5, 5)
    assert (r.p25, r.p50, r.p75) == (20, 30, 40)
