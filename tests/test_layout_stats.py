"""Property tests for the layout/stats/sampling operators
(queries_ext: zorder_layout, grouped_sample_topn, stats_correlation,
embedding_centroids, events_keep_first)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from c99_vectordb_spark import queries_ext as QE


def _deinterleave(z: int, bits: int = QE._ZORDER_BITS) -> tuple[int, int]:
    x = y = 0
    for b in range(bits):
        x |= ((z >> (2 * b)) & 1) << b
        y |= ((z >> (2 * b + 1)) & 1) << b
    return x, y


def test_zorder_morton_inverse(spark, sf_dir):
    """The Morton code must deinterleave back to exactly (zx, zy)."""
    rows = QE.q_zorder_layout(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert _deinterleave(r.zval) == (r.zx, r.zy)


def test_zorder_locality_beats_single_column_sort(spark):
    """The reason to z-order: chunks (≈ row groups) of the z-sorted
    order have bounded spans on BOTH dimensions. On a dense 64x64 grid
    evaluated through the engine's own zorder_col expression, 64-row
    chunks of the z-order are 8x8 tiles (y span 7), while an x-sorted
    order's chunks are full columns (y span 63)."""
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("zx"), (F.col("id") / 64).cast("long").alias("zy")
    )
    rows = df.select("zx", "zy", QE.zorder_col(F.col("zx"), F.col("zy")).alias("z")).collect()
    by_z = sorted(rows, key=lambda r: r.z)
    by_x = sorted(rows, key=lambda r: (r.zx, r.zy))

    def mean_chunk_span(ordered, chunk=64):
        spans = []
        for i in range(0, len(ordered) - chunk + 1, chunk):
            ys = [r.zy for r in ordered[i : i + chunk]]
            spans.append(max(ys) - min(ys))
        return sum(spans) / len(spans)

    z_span, x_span = mean_chunk_span(by_z), mean_chunk_span(by_x)
    assert z_span == 7.0  # exact 8x8 tiles
    assert x_span == 63.0  # full-range columns
    assert z_span < 0.2 * x_span


def test_grouped_sample_topn_bounds_and_determinism(spark, sf_dir):
    out1 = QE.q_grouped_sample_topn(spark, sf_dir).collect()
    out2 = QE.q_grouped_sample_topn(spark, sf_dir).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    per_group: dict[str, list[int]] = {}
    for r in out1:
        per_group.setdefault(r.o_orderpriority, []).append(r.rn)
    for rns in per_group.values():
        assert sorted(rns) == list(range(1, len(rns) + 1))
        assert len(rns) <= 5


def test_stats_correlation_matches_numpy(spark, sf_dir):
    """The closed-form moment formulas must agree with numpy's
    corrcoef/cov/std (float64) to ~1e-6 relative."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_quantity, r.l_extendedprice)
        )
    got = {r.l_returnflag: r for r in QE.q_stats_correlation(spark, sf_dir).collect()}
    assert set(got) == set(by_flag)
    for flag, pairs in by_flag.items():
        x = np.array([p[0] for p in pairs])
        y = np.array([p[1] for p in pairs])
        r = got[flag]
        assert abs(r.corr_qty_price - np.corrcoef(x, y)[0, 1]) < 1e-5
        assert abs(r.covar_samp - np.cov(x, y, ddof=1)[0, 1]) < max(
            1e-5, 1e-6 * abs(r.covar_samp)
        )
        assert abs(r.stddev_qty - np.std(x, ddof=1)) < 1e-5
        assert abs(r.stddev_price - np.std(y, ddof=1)) < 1e-3


def test_embedding_centroids_match_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(np.asarray(r.embedding, dtype=np.float64))
    got: dict[tuple[int, int], float] = {
        (r.label, r.pos): r.centroid
        for r in QE.q_embedding_centroids(spark, sf_dir).collect()
    }
    for label, vecs in by_label.items():
        mean = np.stack(vecs).mean(axis=0)
        for pos in range(len(mean)):
            assert abs(got[(label, pos)] - mean[pos]) < 1e-6


def test_events_keep_first_is_min_per_key(spark, sf_dir):
    from c99_vectordb_spark.queries_registry import _read_events

    ev = _read_events(spark, sf_dir).select(
        "user_id", "event_type", "ts_us", "event_id"
    ).collect()
    best: dict[tuple, tuple] = {}
    for r in ev:
        k = (r.user_id, r.event_type)
        v = (r.ts_us, r.event_id)
        if k not in best or v < best[k]:
            best[k] = v
    got = QE.q_events_keep_first(spark, sf_dir).collect()
    assert len(got) == len(best)
    for r in got:
        assert best[(r.user_id, r.event_type)] == (r.ts_us, r.event_id)


def test_events_ts_us_independent_of_caller_session_tz(spark, sf_dir):
    """The driver builds its own session and may not pin UTC; the
    events reader must self-pin so ts_us (and everything derived from
    it) is identical no matter the caller's timezone."""
    from c99_vectordb_spark.queries_registry import _read_events

    baseline = {
        (r.user_id, r.event_type): r.ts_us
        for r in QE.q_events_keep_first(spark, sf_dir).limit(50).collect()
    }
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        again = {
            (r.user_id, r.event_type): r.ts_us
            for r in QE.q_events_keep_first(spark, sf_dir).limit(50).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    assert again == baseline
