"""Text-analysis and similarity-search semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.operators import similarity as S, textstats as TS


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "hello world  foo"), (1, "one-two three!"), (2, "   ")],
        ["id", "body"],
    )
    out = {r.id: r for r in TS.token_counts(df, "id", "body").collect()}
    assert (out[0].n_ws_tokens, out[0].n_re_tokens) == (3, 3)
    assert (out[1].n_ws_tokens, out[1].n_re_tokens) == (2, 3)  # one-two splits
    assert out[2].n_ws_tokens == 0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is in the house"),
            (1, "der hund und die katze ist nicht da"),
            (2, "el gato y la casa de los perros"),
            (3, "xyzzy plugh qwerty"),
        ],
        ["id", "body"],
    )
    out = {r.id: r.lang_pred for r in TS.lang_id(df, "id", "body").collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_monotone(spark):
    df = spark.createDataFrame(
        [(0, "the meaning of life is to seek wisdom and the truth"),
         (1, "??? !!! ... 123 456 789 !!!")],
        ["id", "body"],
    )
    out = {r.id: r.quality for r in TS.quality_features(df, "id", "body").collect()}
    assert out[0] > out[1]


def test_quality_exact_matches_float_ranks(spark, documents):
    docs = documents.limit(50)
    f = {r.id: r.quality for r in TS.quality_features(docs, "doc_id", "text").collect()}
    e = {
        r.id: r.quality_q16
        for r in TS.quality_features_exact(docs, "doc_id", "text").collect()
    }
    # same ordering under both representations (floor-ppm vs rounded float)
    rank_f = sorted(f, key=lambda k: (f[k], k))
    rank_e = sorted(e, key=lambda k: (e[k], k))
    mismatches = sum(a != b for a, b in zip(rank_f, rank_e))
    assert mismatches <= 2  # floor-vs-round can flip near-exact ties only


def test_fingerprint_ws_invariant(spark):
    df = spark.createDataFrame(
        [(0, "alpha  beta"), (1, "alpha beta"), (2, "ALPHA BETA"), (3, "alpha betá")],
        ["id", "body"],
    )
    out = {r.id: r.fp for r in TS.fingerprints(df, "id", "body").collect()}
    assert out[0] == out[1] == out[2]
    assert out[0] != out[3]


def test_topk_neighbors_exact(spark, embeddings):
    emb = embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.filter(F.col("id") < 2).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    out = S.topk_neighbors(emb, queries, k=3).collect()
    assert len(out) == 6
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    for qid, rows in by_q.items():
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r.id != qid for r in rows)


def test_lsh_recall_vs_exact(spark, embeddings):
    emb = embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.filter(F.col("id") < 5).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    exact = S.topk_neighbors(emb, queries, k=1).collect()
    approx = S.lsh_bucketed_neighbors(emb, queries, dim=64, k=1, n_planes=4).collect()
    # every query finds SOMETHING in its bucket with few planes, and the
    # approximate top-1 score can never beat the exact top-1
    ex = {r.qid: r.score for r in exact}
    ap = {r.qid: r.score for r in approx}
    for qid, s in ap.items():
        assert s <= ex[qid] + 1e-9


def test_lsh_multiprobe_recall_beats_single_probe(spark, embeddings):
    """Hamming-1 probe expansion: candidates are a strict superset of
    single-probe, so recall@k vs exact is >= — and on this corpus the
    near-boundary queries make it strictly better."""
    emb = embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.filter(F.col("id") < 20).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    k = 5
    exact = S.topk_neighbors(emb, queries, k=k).collect()
    single = S.lsh_bucketed_neighbors(emb, queries, dim=64, k=k, n_planes=8).collect()
    multi = S.lsh_bucketed_neighbors(
        emb, queries, dim=64, k=k, n_planes=8, multiprobe=True
    ).collect()

    def hits(approx):
        truth = {}
        for r in exact:
            truth.setdefault(r.qid, set()).add(r.id)
        return sum(1 for r in approx if r.id in truth.get(r.qid, set()))

    h_single, h_multi = hits(single), hits(multi)
    assert h_multi >= h_single
    assert h_multi > h_single, (h_single, h_multi)  # strict on this corpus
    # multiprobe candidates are a superset: every single-probe hit pair
    # must also be found by multiprobe
    single_pairs = {(r.qid, r.id) for r in single}
    multi_found = {(r.qid, r.id) for r in multi}
    # (top-k re-ranking may push a weak single-probe hit out only if
    # multiprobe found >= k strictly better candidates; both k'th
    # scores then satisfy multi >= single per query)
    by_q_single = {}
    for r in single:
        by_q_single.setdefault(r.qid, []).append(r.score)
    by_q_multi = {}
    for r in multi:
        by_q_multi.setdefault(r.qid, []).append(r.score)
    for qid, ss in by_q_single.items():
        ms = by_q_multi.get(qid, [])
        assert len(ms) >= len(ss)
        assert min(ms) >= min(ss) - 1e-9 or len(ms) == k


def test_scrub_pii_redacts_and_counts(spark):
    from c99_vectordb_spark.operators.textstats import scrub_pii

    df = spark.createDataFrame(
        [
            (0, "mail a@b.io and c.d+x@e-f.org, call 555-123-4567."),
            (1, "no pii here"),
            (2, ""),
        ],
        "id long, body string",
    )
    rows = {r.id: r for r in scrub_pii(df, "id", "body").collect()}
    assert rows[0].n_emails == 2 and rows[0].n_phones == 1
    assert rows[0].scrubbed == "mail <EMAIL> and <EMAIL>, call <PHONE>."
    assert rows[1].n_emails == 0 and rows[1].n_phones == 0
    assert rows[2].scrubbed == ""


def test_repetition_stats_exact_and_short_doc_guard(spark):
    from c99_vectordb_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),  # 7 trigrams, 3 distinct
            (1, "x y"),  # under n: must be all zeros (sequence(1,0) trap)
            (2, "unique tokens only here now"),
        ],
        "id long, body string",
    )
    rows = {r.id: r for r in repetition_stats(df, "id", "body").collect()}
    assert rows[0].n_grams == 7 and rows[0].n_distinct == 3
    assert rows[0].rep_ppm == (7 - 3) * 1000000 // 7
    assert (rows[1].n_grams, rows[1].n_distinct, rows[1].rep_ppm) == (0, 0, 0)
    assert rows[2].rep_ppm == 0


def test_gopher_rules_flags(spark):
    df = spark.createDataFrame(
        [
            # 64 words, mean length ~4.1, 8 stopword hits: passes everything
            (1, ("the quick brown fox jumps over lazy dogs " * 8).strip()),
            # too short (8 words) but otherwise clean
            (2, "the cat and the dog in the house"),
            # long enough but zero stopwords
            (3, " ".join(f"word{i}" for i in range(60))),
            # symbol-heavy: same words plus a block of punctuation
            (4, ("the and of to in is it " * 9) + "!!!???;;;###" * 10),
            (5, ""),
        ],
        "id long, body string",
    )
    out = {
        r["id"]: r.asDict()
        for r in TS.gopher_rules(df, "id", "body").collect()
    }
    assert out[1]["gopher_pass"] is True
    assert out[2]["pass_word_count"] is False and out[2]["gopher_pass"] is False
    assert out[3]["pass_stop"] is False and out[3]["stop_hits"] == 0
    assert out[4]["pass_symbol"] is False and out[4]["sym_ppm"] > 100000
    # empty doc: every ppm feature is 0, word-count rule fails
    assert out[5]["n_tokens"] == 0 and out[5]["gopher_pass"] is False


def test_gopher_rules_match_quality_features(spark, documents):
    """mtl_ppm and stop_hits must agree with quality_features_exact —
    same token model, two operators."""
    g = TS.gopher_rules(documents, "doc_id", "text").select(
        "id", "mtl_ppm", F.col("stop_hits").alias("g_stop")
    )
    q = TS.quality_features_exact(documents, "doc_id", "text").select(
        "id", F.col("mtl_ppm").alias("q_mtl"), "stop_ppm", "n_tokens"
    )
    j = g.join(q, "id")
    bad = j.filter(
        (F.col("mtl_ppm") != F.col("q_mtl"))
        | (
            (F.col("n_tokens") > 0)
            & (
                F.floor(F.col("g_stop") * F.lit(1000000) / F.col("n_tokens"))
                != F.col("stop_ppm")
            )
        )
    ).count()
    assert bad == 0


def test_sq_codes_bounded_and_reconstruction_error(spark, embeddings):
    from c99_vectordb_spark.operators.similarity import sq_quantize

    coded = sq_quantize(embeddings).join(
        embeddings.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    bad = coded.filter(
        F.exists(F.col("codes"), lambda c: (c < 0) | (c > 255))
    ).count()
    assert bad == 0
    # dequantized value within half a quantization step of the source
    err = coded.select(
        F.expr(
            "aggregate(zip_with(codes, embedding, "
            "(c, x) -> abs(c / 127.5D - 1.0D - CAST(x AS DOUBLE))), "
            "0.0D, (a, e) -> greatest(a, e))"
        ).alias("maxerr")
    ).agg(F.max("maxerr")).collect()[0][0]
    assert err <= 0.5 / 127.5 + 1e-12


def test_sq_topk_tracks_exact_l2(spark, embeddings):
    """256-level SQ is near-lossless on 64-d vectors: its top-10 by
    code-space L2 must heavily overlap the exact float L2 top-10."""
    from c99_vectordb_spark.operators.similarity import sq_topk
    from c99_vectordb_spark.queries_ext import _sq_query_vec

    q = _sq_query_vec()
    qlit = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in q) + ")"
    exact = [
        r.id
        for r in embeddings.selectExpr(
            "vec_id AS id",
            f"aggregate(zip_with(embedding, {qlit}, "
            "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
            "0.0D, (acc, d) -> acc + d) AS d2",
        )
        .orderBy(F.asc("d2"), F.asc("id"))
        .limit(10)
        .collect()
    ]
    approx = [r.id for r in sq_topk(embeddings, q, k=10).collect()]
    assert len(set(exact) & set(approx)) >= 8


def test_lm_coverage_hand_checked(spark):
    """3-doc corpus, top-2 bigram table derived by hand: 'a b' (3
    occurrences) and 'b c' (2) make the table; doc coverage counts
    per-OCCURRENCE membership."""
    from c99_vectordb_spark.operators.textstats import lm_coverage

    df = spark.createDataFrame(
        [
            (1, "a b c a b"),    # bigrams: ab bc ca ab -> table hits: ab,bc,ab = 3/4
            (2, "a b c"),        # ab bc -> 2/2
            (3, "x y"),          # xy -> 0/1
            (4, "solo"),         # no bigrams
        ],
        "id long, body string",
    )
    out = {
        r.id: (r.n_bigrams, r.n_known, r.cov_ppm)
        for r in lm_coverage(df, "id", "body", top_bigrams=2).collect()
    }
    assert out[1] == (4, 3, 750000)
    assert out[2] == (2, 2, 1000000)
    assert out[3] == (1, 0, 0)
    assert out[4] == (0, 0, 0)


def test_lm_coverage_ranks_boilerplate_above_gibberish(spark, documents):
    """On the real corpus the average coverage must be high (docs are
    drawn from a shared vocabulary) and a shuffled-alphabet gibberish
    doc appended to the corpus must score below the corpus median."""
    from c99_vectordb_spark.operators.textstats import lm_coverage

    gib = documents.sparkSession.createDataFrame(
        [(999999, "zq wv xk jq qz vxw kzz qjx wqv zxq", "xx", "xx", 30)],
        documents.schema,
    )
    out = lm_coverage(documents.union(gib), "doc_id", "text", top_bigrams=500)
    rows = {r.id: r.cov_ppm for r in out.collect()}
    gib_cov = rows.pop(999999)
    med = sorted(rows.values())[len(rows) // 2]
    assert gib_cov < med


def test_random_projection_map_only_and_shape(spark, embeddings):
    from c99_vectordb_spark.operators.similarity import random_projection

    out = random_projection(embeddings, "vec_id", "embedding", 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side expressions
    rows = out.limit(5).collect()
    assert all(len(r.proj) == 8 for r in rows)


def test_random_projection_preserves_relative_distances(spark):
    """JL sanity with a GUARANTEED gap (the earlier fixture-based gate
    never fired — review finding): for single-coordinate differences a
    ±1 projection scales every distance by exactly sqrt(out_dim), so
    the near/far ordering MUST survive, whatever the signs."""
    import math

    from c99_vectordb_spark.operators.similarity import random_projection

    dim = 64
    base = [0.0] * dim
    near = list(base); near[3] = 0.125          # |a-b| = 0.125
    far = list(base); far[7] = 8.0              # |a-c| = 8.0
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    proj = {r.id: list(r.proj) for r in random_projection(df, out_dim=16).collect()}

    def d(u, v):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(u, v)))

    # exactly sqrt(16)*0.125 and sqrt(16)*8.0
    assert abs(d(proj[0], proj[1]) - 4 * 0.125) < 1e-9
    assert abs(d(proj[0], proj[2]) - 4 * 8.0) < 1e-9
    assert d(proj[0], proj[1]) < d(proj[0], proj[2])


def test_greedy_max_min_prefers_diverse_over_relevant():
    from c99_vectordb_spark.operators.similarity import greedy_max_min

    # doc 1: best score; doc 2: second-best but near-identical to 1
    # (huge dot); doc 3: slightly worse score, orthogonal. k=2 must
    # pick 1 then 3, skipping the redundant 2.
    scores = [(1, 100), (2, 110), (3, 120)]
    dots = {(1, 2): 900, (1, 3): 0, (2, 3): 5}
    assert greedy_max_min(scores, dots, 2) == [(1, 1, 100), (2, 3, 120)]
    # k=3 then takes 2 last
    assert greedy_max_min(scores, dots, 3)[2] == (3, 2, 110)
    # ties on max-dot fall to score then id
    scores2 = [(7, 50), (8, 60), (9, 60)]
    dots2 = {}
    assert greedy_max_min(scores2, dots2, 3) == [(1, 7, 50), (2, 8, 60), (3, 9, 60)]
    assert greedy_max_min([], {}, 3) == []


def test_greedy_max_min_k_nonpositive():
    from c99_vectordb_spark.operators.similarity import greedy_max_min

    assert greedy_max_min([(1, 100)], {}, 0) == []
    assert greedy_max_min([(1, 100)], {}, -2) == []


def test_sq_topk_batch_matches_single_query(spark, embeddings):
    """The batch-serving SQ tier must agree with the single-query
    operator for each query in the table (same codes, same integer
    distances, same tie-breaks)."""
    from c99_vectordb_spark.operators.similarity import sq_topk, sq_topk_batch
    from pyspark.sql import functions as F

    qvecs = {
        r.vec_id: list(r.embedding)
        for r in embeddings.filter(F.col("vec_id") < 3).collect()
    }
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = sq_topk_batch(embeddings, queries, k=5)
    got = {
        qid: [(r.id, r.qdist) for r in rows]
        for qid, rows in (
            (q, sorted(
                [r for r in batch.collect() if r.qid == q],
                key=lambda r: (r.qdist, r.id),
            ))
            for q in qvecs
        )
    }
    for qid, qv in qvecs.items():
        want = [
            (r.id, r.qdist)
            for r in sq_topk(embeddings, qv, k=6).collect()
            if r.id != qid
        ][:5]
        assert got[qid] == want, f"qid {qid}"
