"""Property tests for the round-6 session-5 operator wave: HLL,
Bloom semi-join, q-gram fuzzy join, hybrid RRF retrieval.

Oracle parity (tools/verify_oracle) proves Spark==DuckDB; these prove
the SEMANTICS on axes a twin bug could share — the HLL merge law and
hash uniformity contract, the Bloom filter's zero-false-negative
guarantee, blocking recall of the fuzzy join, and RRF's fusion laws —
plus exact pure-Python recounts of the fused ranks.
"""
from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from c99_vectordb_spark.operators.fuzzy import (
    FUZZY_D,
    corrupt_name,
    gram_blocked_matches,
)
from c99_vectordb_spark.operators.sketches import (
    BLOOM_K,
    HLL_M,
    HLL_W,
    bloom_bits,
    bloom_pass_keys,
    distinct_keys,
    hll_estimate,
    hll_registers,
)
from c99_vectordb_spark.queries_ext import (
    RRF_KCONST,
    RRF_POOL,
    q_approx_distinct_hll,
    q_bloom_semi_join,
    q_fuzzy_join_parts,
    q_sim_hybrid_rrf,
)


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------

def test_hll_md5_fold_matches_python(spark):
    """The Spark conv(substring(md5..)) fold == Python md5 int fold —
    the cross-engine uniform-hash contract HLL rests on."""
    vals = ["1234", "x", "", "customer#42", "99999999"]
    df = spark.createDataFrame([(v,) for v in vals], "k string").select(
        "k",
        F.conv(F.substring(F.md5(F.col("k")), 1, 14), 16, 10)
        .cast("long")
        .alias("h"),
    )
    got = {r["k"]: r["h"] for r in df.collect()}
    for v in vals:
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:14], 16)


def test_hll_merge_law(spark, sf_dir):
    """Registers built on disjoint halves and merged with max() ==
    registers built globally — the property that makes the sketch a
    valid Spark partial aggregate at any partitioning."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keyed = orders.select(
        F.col("o_custkey").alias("key"), (F.col("o_orderkey") % 2).alias("half")
    )
    g = hll_registers(keyed, F.col("key"))
    halves = hll_registers(keyed, F.col("key"), group_cols=("half",))
    merged = halves.groupBy("reg").agg(F.max("rho").alias("rho"))
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_estimate_tracks_truth(spark, sf_dir):
    """m=256 -> ~6.5% std error; assert the estimate is within 20%
    (3 sigma) of the exact distinct count — catches any recurrence of
    the short-key rank blowout (the polynomial fold first cut was
    +678% here)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keyed = orders.select(F.col("o_custkey").alias("key"))
    est = hll_estimate(hll_registers(keyed, F.col("key"))).collect()[0]["est_hll"]
    true = orders.select("o_custkey").distinct().count()
    assert abs(est - true) / true < 0.20
    assert est > 0


def test_hll_query_rows_identical(spark, sf_dir):
    """The global and merged_halves report rows carry identical
    estimates — the merge law surfaced as data."""
    rows = {r["scope"]: r for r in q_approx_distinct_hll(spark, sf_dir).collect()}
    g, m = rows["global"], rows["merged_halves"]
    assert g["est_hll"] == m["est_hll"]
    assert g["nonzero_regs"] == m["nonzero_regs"]
    assert g["err_ppm"] == m["err_ppm"]
    assert g["zero_regs"] == HLL_M - g["nonzero_regs"]


def test_hll_rho_bounds(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    regs = hll_registers(orders, F.col("o_custkey")).collect()
    assert regs
    for r in regs:
        assert 0 <= r["reg"] < HLL_M
        assert 1 <= r["rho"] <= HLL_W + 1


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

def test_bloom_never_false_negative(spark, sf_dir):
    """Every build-side key must pass its own filter — the defining
    Bloom guarantee (a runtime filter that drops true matches corrupts
    the join it accelerates)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    build = orders.filter(F.col("o_orderstatus") == "F")
    bits = bloom_bits(build, F.col("o_orderkey"))
    passing = bloom_pass_keys(distinct_keys(build, F.col("o_orderkey")), bits)
    n_build = build.select("o_orderkey").distinct().count()
    assert passing.count() == n_build


def test_bloom_report_invariants(spark, sf_dir):
    r = q_bloom_semi_join(spark, sf_dir).collect()[0]
    # every exact match passes the bloom (no false negatives)
    assert r["bloom_pass"] >= r["exact_matches"]
    assert r["false_positives"] == r["bloom_pass"] - r["exact_matches"]
    # bits set bounded by k * build_keys and by m
    assert r["bits_set"] <= min(BLOOM_K * r["build_keys"], r["m"])
    # fp rate among true negatives is sane (< 10% at test SF)
    assert 0 <= r["fp_ppm"] < 100_000


# ---------------------------------------------------------------------------
# fuzzy join
# ---------------------------------------------------------------------------

def test_corrupt_name_is_single_deletion(spark, sf_dir):
    """The dirty twin is exactly one character shorter and within
    edit distance 1 of the original (deterministic, data-derived)."""
    from c99_vectordb_spark.functions.text import string_hash

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rows = (
        part.select(
            "p_name",
            corrupt_name(F.col("p_name"), string_hash(F.col("p_name"))).alias("d"),
        )
        .withColumn("lev", F.levenshtein("p_name", "d"))
        .collect()
    )
    for r in rows:
        assert len(r["d"]) == len(r["p_name"]) - 1
        assert r["lev"] == 1


def test_fuzzy_blocking_full_recall_on_testdata(spark, sf_dir):
    """The q-gram count filter is a heuristic; on the real fixture it
    must not lose a single true pair: verified pairs == the exhaustive
    all-pairs truth under lev <= d."""
    from c99_vectordb_spark.functions.text import string_hash

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    dirty = part.filter(F.col("p_partkey") % 4 == 0).select(
        F.col("p_partkey").alias("dirty_key"),
        corrupt_name(F.col("p_name"), string_hash(F.col("p_name"))).alias(
            "dirty_name"
        ),
    )
    clean = part.select(F.col("p_name").alias("match_name")).distinct()
    blocked = {
        (r["dirty_key"], r["match_name"])
        for r in gram_blocked_matches(dirty, clean).collect()
    }
    truth = {
        (r["dirty_key"], r["match_name"])
        for r in dirty.crossJoin(clean)
        .withColumn("lev", F.levenshtein("dirty_name", "match_name"))
        .filter(F.col("lev") <= FUZZY_D)
        .collect()
    }
    assert blocked == truth


def test_fuzzy_query_best_match_is_origin_or_closer(spark, sf_dir):
    """Each dirty entity's best match has lev <= 1: the origin name is
    always 1 deletion away, so nothing worse can win."""
    rows = q_fuzzy_join_parts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["lev"] <= 1
        assert r["n_verified"] >= 1


# ---------------------------------------------------------------------------
# hybrid RRF
# ---------------------------------------------------------------------------

def test_rrf_fusion_matches_python_recount(spark, sf_dir):
    """Recompute RRF from the two pools' raw ranks in Python and
    compare the fused top-10 exactly (ranks and rounded scores)."""
    from c99_vectordb_spark import hashing
    from c99_vectordb_spark.model import DIM
    from c99_vectordb_spark.operators.corpus import bm25_topk
    from c99_vectordb_spark.queries_registry import RECALL_QUERY_TEXT

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qv = hashing.embed_text_int(RECALL_QUERY_TEXT, DIM)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    dense_scores = {}
    for did, text in texts.items():
        v = hashing.embed_text_int(text, DIM)
        dense_scores[did] = sum((a - b) * (a - b) for a, b in zip(v, qv))
    dense_pool = sorted(dense_scores, key=lambda d: (dense_scores[d], d))[:RRF_POOL]
    r_dense = {d: i + 1 for i, d in enumerate(dense_pool)}
    sparse_rows = bm25_topk(
        docs, hashing.tokenize(RECALL_QUERY_TEXT), "doc_id", "text", k=RRF_POOL
    ).collect()
    sparse_pool = sorted(sparse_rows, key=lambda r: (-r["score_q26"], r["id"]))
    r_bm25 = {r["id"]: i + 1 for i, r in enumerate(sparse_pool)}
    fused = {}
    for d in set(r_dense) | set(r_bm25):
        s = 0.0
        if d in r_dense:
            s += 1.0 / (RRF_KCONST + r_dense[d])
        if d in r_bm25:
            s += 1.0 / (RRF_KCONST + r_bm25[d])
        fused[d] = round(s, 6)
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = q_sim_hybrid_rrf(spark, sf_dir).collect()
    assert [(r["id"], r["rrf_score"]) for r in got] == want
    for r in got:
        assert r["r_dense"] == r_dense.get(r["id"], 0)
        assert r["r_bm25"] == r_bm25.get(r["id"], 0)


def test_rrf_doc_in_both_pools_beats_single_pool_peer(spark, sf_dir):
    """Fusion law: a doc ranked in BOTH pools at rank r outscores any
    doc present in only one pool at the same rank."""
    rows = q_sim_hybrid_rrf(spark, sf_dir).collect()
    both = [r for r in rows if r["r_dense"] > 0 and r["r_bm25"] > 0]
    single = [r for r in rows if (r["r_dense"] > 0) != (r["r_bm25"] > 0)]
    if both and single:
        assert max(r["rrf_score"] for r in both) >= max(
            r["rrf_score"] for r in single
        )


# ---------------------------------------------------------------------------
# floor-division cross-engine parity (negative inputs)
# ---------------------------------------------------------------------------

def test_floor_div_twins_agree_on_negatives(spark):
    """DuckDB's integer `//` truncates toward zero just like Spark's
    `div` — so the floored-bucketing twins must BOTH use the
    truncate-then-correct construction. This pins the pair on exactly
    the pre-1970 inputs the testdata never exercises (round-5 advisor
    note, closed round 6: the oracles previously used bare `//`)."""
    import duckdb

    from c99_vectordb_spark.functions.text import floor_div_sql
    from c99_vectordb_spark.hashing import duckdb_floor_div_sql

    vals = [-7_200_000_001, -3_600_000_000, -1, 0, 1, 3_599_999_999,
            3_600_000_000, 7_200_000_001]
    df = spark.createDataFrame([(v,) for v in vals], "ts_us long").select(
        "ts_us",
        F.expr(floor_div_sql("ts_us", 3_600_000_000)).alias("h"),
    )
    got = {r["ts_us"]: r["h"] for r in df.collect()}
    duck_expr = duckdb_floor_div_sql("v", 3_600_000_000)
    for v in vals:
        (d,) = duckdb.sql(f"SELECT {duck_expr} FROM (SELECT {v}::BIGINT AS v)").fetchone()
        assert got[v] == d == v // 3_600_000_000, (v, got[v], d)


# ---------------------------------------------------------------------------
# stupid-backoff LM scoring
# ---------------------------------------------------------------------------

def test_lm_score_train_sources_are_in_domain(spark, sf_dir):
    """The LM's own training sources must score with ZERO backoff
    (every training bigram is in the table by construction) and an
    avg log-prob at least as high as every out-of-domain source."""
    from c99_vectordb_spark.queries_pipeline import (
        LM_TRAIN_SOURCES,
        q_text_lm_score,
    )

    rows = {r["source"]: r for r in q_text_lm_score(spark, sf_dir).collect()}
    assert set(LM_TRAIN_SOURCES) <= set(rows)
    worst_train = min(rows[s]["avg_lp_q10"] for s in LM_TRAIN_SOURCES)
    for s, r in rows.items():
        assert r["n_bigrams"] > 0
        if s in LM_TRAIN_SOURCES:
            assert r["backoff_ppm"] == 0
        else:
            assert r["backoff_ppm"] > 0  # real out-of-domain signal
            assert r["avg_lp_q10"] <= worst_train


# ---------------------------------------------------------------------------
# perceptual-hash image dedup
# ---------------------------------------------------------------------------

def test_phash_identical_images_same_hash(spark, sf_dir):
    """Two docs with equal doc_id mod 256 and equal block count render
    byte-identical JPEGs — their perceptual hashes MUST collide; and
    the real-decode hash must equal the closed-form recomputation."""
    from c99_vectordb_spark.operators.multimodal import (
        media_from_documents_jpeg_real,
        media_phash64,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ph = {
        r["id"]: (r["c0"], r["c1"], r["c2"], r["c3"])
        for r in media_phash64(media_from_documents_jpeg_real(docs)).collect()
    }
    lens = {
        r["doc_id"]: max(1, (len(r["text"].encode()) + 63) // 64)
        for r in docs.collect()
    }

    def closed_form(did, nb):
        m = [(7 * did + 13 * ((i * nb) // 64)) % 256 for i in range(64)]
        sm = sum(m)
        bits = [1 if 64 * v > sm else 0 for v in m]
        return tuple(
            sum(bits[16 * j + k] << k for k in range(16)) for j in range(4)
        )

    twins = 0
    for did, nb in lens.items():
        assert ph[did] == closed_form(did, nb), did
        other = did + 256
        if other in lens and lens[other] == nb:
            assert ph[did] == ph[other]
            twins += 1
    if max(lens) > 256:
        assert twins > 0  # the fixture genuinely contains identical images


def test_phash_report_consistency(spark, sf_dir):
    from c99_vectordb_spark.queries_ext import q_multimodal_phash_dedup

    m = {
        r["metric"]: r["value"]
        for r in q_multimodal_phash_dedup(spark, sf_dir).collect()
    }
    assert m["images"] >= m["distinct_phash"] >= 1
    assert m["dup_clusters"] <= m["distinct_phash"]
    assert (m["exact_dup_pairs"] > 0) == (m["dup_clusters"] > 0)
    assert m["near_pairs_h3"] >= 0


# ---------------------------------------------------------------------------
# basket pairs / weighted quantiles / phrase search
# ---------------------------------------------------------------------------

def test_basket_pairs_support_law(spark, sf_dir):
    """Every reported pair's support is bounded by both items'
    marginals, meets the min-support gate, and lift matches the staged
    integer recomputation."""
    from c99_vectordb_spark.queries_ext import BASKET_MIN_SUPPORT, q_basket_pairs

    rows = q_basket_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["support"] >= BASKET_MIN_SUPPORT
        assert r["support"] <= min(r["c_a"], r["c_b"])
        n_orders = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_orderkey")
            .distinct()
            .count()
        )
        assert r["lift_ppm"] == (
            ((1_000_000 * r["support"]) // r["c_b"]) * n_orders
        ) // r["c_a"]
        break  # recount once; laws above run for all rows


def test_weighted_quantiles_match_python(spark, sf_dir):
    """Exact recount: expand every lineitem to its quantity weight and
    take the lower weighted-nearest-rank percentile in Python."""
    from c99_vectordb_spark.queries_ext import q_lineitem_weighted_quantiles

    got = {r["rf"]: r for r in q_lineitem_weighted_quantiles(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    ).collect()
    import collections

    groups = collections.defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append(
            (r["l_extendedprice"], r["l_orderkey"], r["l_linenumber"], int(r["l_quantity"]))
        )
    for rf, rows in groups.items():
        rows.sort()
        tot = sum(w for *_k, w in rows)
        for q, col in ((1, "wp25"), (2, "wp50"), (3, "wp75")):
            cw = 0
            for price, *_k, w in rows:
                cw += w
                if 4 * cw >= q * tot:
                    assert got[rf][col] == round(price, 2), (rf, col)
                    break


def test_phrase_search_matches_regex(spark, sf_dir):
    """Positional-postings hits == a direct tokenized scan for the
    phrase (the thing the index exists to avoid)."""
    from c99_vectordb_spark.hashing import tokenize
    from c99_vectordb_spark.queries_ext import PHRASE_QUERY, q_corpus_phrase_search

    got = {r["id"]: r["n_hits"] for r in q_corpus_phrase_search(spark, sf_dir).collect()}
    want = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        toks = tokenize(r["text"])
        n = sum(
            1
            for i in range(len(toks) - 2)
            if tuple(toks[i : i + 3]) == PHRASE_QUERY
        )
        if n:
            want[r["doc_id"]] = n
    assert got == want


# ---------------------------------------------------------------------------
# trimmed/winsorized mean, CUPED
# ---------------------------------------------------------------------------

def test_trimmed_mean_matches_python(spark, sf_dir):
    from c99_vectordb_spark.queries_ext import q_orders_trimmed_mean

    got = {r["prio"]: r for r in q_orders_trimmed_mean(spark, sf_dir).collect()}
    import collections

    groups = collections.defaultdict(list)
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        groups[r["o_orderpriority"]].append(
            (round(r["o_totalprice"] * 100), r["o_orderkey"])
        )
    for prio, vals in groups.items():
        vals.sort()
        n = len(vals)
        k = n // 20
        kept = [v for v, _ in vals[k : n - k]]
        assert got[prio]["n"] == n and got[prio]["k"] == k
        assert got[prio]["trimmed_mean"] == round(
            sum(kept) / len(kept) / 100.0, 4
        )
        lo, hi = vals[k][0], vals[n - k - 1][0]
        assert got[prio]["winsor_mean"] == round(
            (sum(kept) + k * lo + k * hi) / n / 100.0, 4
        )


def test_cuped_reduces_variance_and_preserves_means(spark, sf_dir):
    """CUPED laws: theta is shared (pooled) across arms; the
    adjustment must not move the POOLED mean (sum n*adj == sum n*raw
    up to rounding); var_reduction_ppm in [0, 1e6]."""
    from c99_vectordb_spark.queries_ext import q_events_cuped

    rows = q_events_cuped(spark, sf_dir).collect()
    assert len(rows) == 2
    assert rows[0]["theta"] == rows[1]["theta"]
    assert rows[0]["var_reduction_ppm"] == rows[1]["var_reduction_ppm"]
    assert 0 <= rows[0]["var_reduction_ppm"] <= 1_000_000
    n_tot = sum(r["n"] for r in rows)
    raw = sum(r["n"] * r["mean_metric"] for r in rows) / n_tot
    adj = sum(r["n"] * r["mean_adjusted"] for r in rows) / n_tot
    assert abs(raw - adj) < 0.01


# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------

def test_bootstrap_matches_python_recount(spark, sf_dir):
    """Full exact recount at test SF: rebuild all 64 Poisson resample
    means from md5 in Python and check the CI picks bit-for-bit."""
    import hashlib

    from c99_vectordb_spark.queries_ext import (
        BOOT_B,
        BOOT_HI_RANK,
        BOOT_LO_RANK,
        _POISSON_CUM_PPM,
        q_orders_bootstrap_ci,
    )

    rows = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    base = [(r["o_orderkey"], round(r["o_totalprice"] * 100)) for r in rows]

    def draw(k, b):
        u = int(hashlib.md5(f"{k}_{b}".encode()).hexdigest()[:14], 16) % 1_000_000
        for c, t in enumerate(_POISSON_CUM_PPM):
            if u < t:
                return c
        return 8

    means = []
    for b in range(BOOT_B):
        sw = sv = 0
        for k, v in base:
            c = draw(k, b)
            sw += c
            sv += c * v
        means.append((sv / sw, b))
    means.sort()
    got = q_orders_bootstrap_ci(spark, sf_dir).collect()[0]
    assert got["n_resamples"] == BOOT_B
    assert got["n_rows"] == len(base)
    assert got["ci_lo"] == round(means[BOOT_LO_RANK - 1][0] / 100.0, 4)
    assert got["ci_hi"] == round(means[BOOT_HI_RANK - 1][0] / 100.0, 4)
    assert got["ci_lo"] < got["ci_hi"]
    assert got["mean_price"] == round(
        sum(v for _, v in base) / len(base) / 100.0, 4
    )


# ---------------------------------------------------------------------------
# retrieval evaluation (nDCG)
# ---------------------------------------------------------------------------

def test_ndcg_laws(spark, sf_dir):
    """Metric laws: ndcg in (0, 1e6]; a perfect-order retriever would
    hit idcg (dcg <= idcg always); mrr consistent with hits; the three
    retrievers share one idcg denominator."""
    from c99_vectordb_spark.queries_ext import q_sim_eval_ndcg

    rows = {r["retriever"]: r for r in q_sim_eval_ndcg(spark, sf_dir).collect()}
    assert set(rows) == {"dense", "bm25", "rrf"}
    idcgs = {r["idcg_q"] for r in rows.values()}
    assert len(idcgs) == 1
    for r in rows.values():
        assert 0 <= r["dcg_q"] <= r["idcg_q"]
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        assert (r["mrr_ppm"] > 0) == (r["hits10"] > 0)
        assert 0 <= r["hits10"] <= 10


# ---------------------------------------------------------------------------
# HTML boilerplate extraction
# ---------------------------------------------------------------------------

def test_html_extract_inverts_wrap(spark, sf_dir):
    """Every wrapped doc recovers exactly; adversarial bodies with raw
    markup and entity-looking text survive the escape/unescape cycle."""
    from c99_vectordb_spark.operators.textstats import html_extract, html_wrap
    from c99_vectordb_spark.queries_ext import q_text_html_extract

    rows = q_text_html_extract(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] == r["n_docs"]

    adv = spark.createDataFrame(
        [
            ("<script>alert(1)</script>", "t"),
            ("a & b &amp; c", "t"),
            ("text with </p> closing tag", "t"),
            ("multi\n\nline   spaces", "t"),
        ],
        "text string, title string",
    ).select(
        html_extract(html_wrap(F.col("text"), F.col("title"))).alias("rec"),
        F.trim(F.regexp_replace("text", r"\s+", " ")).alias("norm"),
    )
    for r in adv.collect():
        assert r["rec"] == f"t t {r['norm']}", r


# ---------------------------------------------------------------------------
# data-quality audits
# ---------------------------------------------------------------------------

def test_benford_audit_laws(spark, sf_dir):
    from c99_vectordb_spark.queries_ext import _BENFORD_PPM, q_audit_benford_prices

    rows = {r["digit"]: r for r in q_audit_benford_prices(spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    assert sum(_BENFORD_PPM) in (999999, 1000000)  # expectation is a pmf
    n = sum(r["n_obs"] for r in rows.values())
    for d, r in rows.items():
        assert r["exp_ppm"] == _BENFORD_PPM[d - 1]
        assert r["obs_ppm"] == (1_000_000 * r["n_obs"]) // n
        assert r["dev_ppm"] == r["obs_ppm"] - r["exp_ppm"]
    # the synthetic data is provably NOT Benford — the audit must fire
    assert max(abs(r["dev_ppm"]) for r in rows.values()) > 50_000


def test_reconciliation_audit_accounts_for_every_order(spark, sf_dir):
    from c99_vectordb_spark.queries_ext import q_audit_order_reconciliation

    rows = {r["band"]: r for r in q_audit_order_reconciliation(spark, sf_dir).collect()}
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows.values()) == n_orders
    # the testdata has orders with no lineitems AND unenforced totals —
    # both findings must surface
    assert rows.get("missing_lines") is not None
    assert "exact" not in rows or rows["exact"]["n_orders"] < n_orders
    for r in rows.values():
        if r["band"] != "missing_lines":
            assert r["min_ppm"] is not None and r["min_ppm"] <= r["max_ppm"]


# ---------------------------------------------------------------------------
# forecast backtest / revenue concentration
# ---------------------------------------------------------------------------

def test_forecast_mase_python_recount(spark, sf_dir):
    """Rebuild the dense hourly series per type in Python and recount
    both absolute-error sums exactly."""
    import collections

    from c99_vectordb_spark.queries_ext import q_events_forecast_mase
    from c99_vectordb_spark.queries_registry import _read_events

    got = {r["event_type"]: r for r in q_events_forecast_mase(spark, sf_dir).collect()}
    ev = _read_events(spark, sf_dir).select("event_type", "ts_us").collect()
    cnt = collections.Counter(
        (r["event_type"], r["ts_us"] // 3_600_000_000) for r in ev
    )
    h0 = min(h for _, h in cnt)
    h1 = max(h for _, h in cnt)
    types = {t for t, _ in cnt}
    for t in types:
        ys = {h: cnt.get((t, h), 0) for h in range(h0, h1 + 1)}
        ae24 = sum(abs(ys[h] - ys[h - 24]) for h in range(h0 + 24, h1 + 1))
        ae1 = sum(abs(ys[h] - ys[h - 1]) for h in range(h0 + 24, h1 + 1))
        # the Spark twin restricts to hours where BOTH lags exist on
        # the grid: h in [h0+24, h1] — same range
        assert got[t]["ae_seasonal"] == ae24, t
        assert got[t]["ae_naive"] == ae1, t
        assert got[t]["mase_ppm"] == (1_000_000 * ae24) // max(ae1, 1)


def test_gini_python_recount(spark, sf_dir):
    from c99_vectordb_spark.queries_ext import q_customer_revenue_gini

    got = q_customer_revenue_gini(spark, sf_dir).collect()[0]
    rev = {}
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        rev[r["o_custkey"]] = rev.get(r["o_custkey"], 0) + round(
            r["o_totalprice"] * 100
        )
    xs = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    sx = sum(x for _, x in xs)
    srx = sum((i + 1) * x for i, (_, x) in enumerate(xs))
    assert got["n_customers"] == n and got["total_cents"] == sx
    assert got["gini_ppm"] == (1_000_000 * ((2 * srx - (n + 1) * sx) // n)) // sx
    assert got["bottom50_ppm"] == (
        1_000_000 * sum(x for _, x in xs[: n // 2])
    ) // sx
    assert got["top10_ppm"] == (1_000_000 * sum(x for _, x in xs[n - n // 10:])) // sx
    # concentration sanity: top 10% holds more than 10% only if skewed;
    # either way the Lorenz ordering must hold
    assert got["top1_ppm"] <= got["top10_ppm"] <= 1_000_000


def test_html_extract_prefix_named_tags_survive(spark):
    """Regression (review finding): '<navy>' must NOT anchor the
    '<nav>' drop — a bare '<nav[^>]*>' pattern deleted visible text
    between a prefix-named tag and a later genuine '</nav>'."""
    from c99_vectordb_spark.operators.textstats import html_extract

    df = spark.createDataFrame(
        [("<navy>blue</navy> keep me <nav>menu</nav> tail",)], "h string"
    ).select(html_extract(F.col("h")).alias("rec"))
    assert df.collect()[0]["rec"] == "blue keep me tail"


def test_drift_kl_laws(spark, sf_dir):
    """KL laws: the aggregate corpus CANNOT drift from itself (pooled
    score ~0 up to Laplace quantization) and every per-source score is
    bounded below by the quantization floor."""
    from c99_vectordb_spark.queries_ext import q_corpus_drift_kl

    rows = q_corpus_drift_kl(spark, sf_dir).collect()
    assert rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        # integer quantization can dip a hair below zero, never far
        assert r["kl_q10"] >= -16
        assert r["kl_q10"] <= 20 * 1024  # saturation bound (log2 ratio <= 20)
