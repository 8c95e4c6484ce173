"""Naive == staged equality for the unique-vector-collapsed kNN
operators (r7 judge item #2: sim_mutual_nn / sim_lof_outliers went
quadratic-in-cluster on the sf1 90%-dup corpus; the fix routes their
candidate stages through vec_exact_collapse + tier_pruned_expand in
operators/similarity.py).

The fixture is built to hit the expansion's hard cases:
- duplicate clusters of sizes 1..8 with ids INTERLEAVED across
  clusters (round-robin assignment), so tie-breaking by id crosses
  cluster boundaries;
- one cluster larger than the k+1 member-expansion cap;
- distinct vectors with EQUAL int8 codes (dist2 = 0 across different
  clusters — the cross-cluster zero tier);
- two clusters at identical dist2 from a third (a tie tier spanning
  clusters), plus near-identical cosines that collide after round(,4).

The registry oracles stay byte-identical (verified separately by
tools/verify_oracle.py at sf0.01 and sf0.001); these tests prove the
plan rewrite cannot diverge on shapes the parquet testdata never
exercises (heavy duplication).
"""

from __future__ import annotations

from pyspark.sql import functions as F

DIM = 64


def _emb_fixture(spark):
    base = [0.1] * DIM

    def mk(mods):
        v = list(base)
        for i, d in mods.items():
            v[i] = v[i] + d
        return [float(x) for x in v]

    uniq = [
        mk({}),                      # u0: the big cluster
        mk({0: 0.004}),              # u1: code +1 at pos 0 (dist2 1 from u0)
        mk({1: 0.004}),              # u2: ties u1 at dist2 1 from u0
        mk({0: 0.004, 1: 0.004}),    # u3
        mk({2: 0.05}),               # u4: mid distance
        mk({3: 0.05}),               # u5: ties u4 from u0
        [float(-x) for x in base],   # u6: opposite bucket half-space
        mk({0: 0.004, 2: 0.05}),     # u7
        mk({5: 0.001}),              # u8: SAME codes as u0 (cross-cluster
                                     #     dist2 = 0), different raw vector
        mk({j: 0.3 for j in range(8)}),  # u9: far cluster
    ]
    sizes = [8, 2, 3, 1, 5, 1, 2, 4, 3, 3]
    rows = []
    next_id = 0
    for r in range(max(sizes)):
        for c, sz in enumerate(sizes):
            if r < sz:
                rows.append((next_id, uniq[c], c))
                next_id += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fixture_exercises_hard_cases(spark):
    from c99_vectordb_spark.operators.similarity import sq_code_expr

    emb = _emb_fixture(spark)
    # 32 points over 10 unique vectors, one cluster > k+1
    assert emb.count() == 32
    assert emb.select("embedding").distinct().count() == 10
    # u8 really collides with u0 in code space while differing raw
    codes = (
        emb.selectExpr("label", f"{sq_code_expr('embedding')} AS c")
        .distinct()
        .collect()
    )
    by_label = {r["label"]: tuple(r["c"]) for r in codes}
    assert by_label[8] == by_label[0]
    assert by_label[1] != by_label[0]


def test_lof_staged_equals_naive(spark):
    from c99_vectordb_spark.queries_wave8 import (
        sim_lof_candidates,
        sim_lof_report,
    )

    emb = _emb_fixture(spark)
    assert _rows(sim_lof_report(emb, staged=True)) == _rows(
        sim_lof_report(emb, staged=False)
    )
    # the staged edge set must be a SUBSET of the naive candidates
    # (supersets could change row_number selections)
    naive = set(_rows(sim_lof_candidates(emb, staged=False)))
    staged = set(_rows(sim_lof_candidates(emb, staged=True)))
    assert staged <= naive
    # and materially smaller in duplicate-heavy shape (the point)
    assert len(staged) < len(naive)


def test_mutual_nn_staged_equals_naive(spark):
    from c99_vectordb_spark.queries_wave7 import sim_mutual_nn_best

    emb = _emb_fixture(spark)
    assert _rows(sim_mutual_nn_best(emb, staged=True)) == _rows(
        sim_mutual_nn_best(emb, staged=False)
    )


def test_mutual_nn_staged_equals_naive_on_parquet(spark):
    """Real-data replay at sf0.001 — unique-heavy (the opposite shape
    of the fixture), so the collapse degenerates to ~1 point per
    cluster and must still agree."""
    from c99_vectordb_spark.queries_wave7 import sim_mutual_nn_best

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert _rows(sim_mutual_nn_best(emb, staged=True)) == _rows(
        sim_mutual_nn_best(emb, staged=False)
    )


def test_cosine_top_pairs_staged_equals_naive(spark):
    from c99_vectordb_spark.operators.dedup import (
        cosine_top_pairs,
        cosine_top_pairs_staged,
    )

    emb = _emb_fixture(spark).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    for k in (5, 20, 60):
        naive = [tuple(r) for r in cosine_top_pairs(emb, k=k).collect()]
        staged = [tuple(r) for r in cosine_top_pairs_staged(emb, k=k).collect()]
        assert staged == naive, f"k={k}"


def test_cosine_top_pairs_staged_equals_naive_on_parquet(spark):
    from c99_vectordb_spark.operators.dedup import (
        cosine_top_pairs,
        cosine_top_pairs_staged,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    naive = [tuple(r) for r in cosine_top_pairs(emb, k=20).collect()]
    staged = [tuple(r) for r in cosine_top_pairs_staged(emb, k=20).collect()]
    assert staged == naive


def _docs_fixture(spark):
    """Dup-heavy TEXT fixture: clusters of identical documents plus
    near-identical variants within hamming range of each other, ids
    interleaved across clusters."""
    texts = [
        "the quick brown fox jumps over the lazy dog " * 3,
        "the quick brown fox jumps over the lazy dog " * 3 + "extra tail",
        "a completely different document about spark plans and shuffles",
        "a completely different document about spark plans and shuffle",
        "third topic entirely unrelated to the others with rare words",
    ]
    sizes = [6, 3, 4, 2, 5]
    rows = []
    next_id = 0
    for r in range(max(sizes)):
        for c, sz in enumerate(sizes):
            if r < sz:
                rows.append((next_id, texts[c], "en", f"src{c}", len(texts[c])))
                next_id += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_simhash_pairs_staged_equals_naive(spark):
    from c99_vectordb_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_near_pairs_staged,
    )

    docs = _docs_fixture(spark)
    for cap in (None, 8):
        naive = _rows(
            simhash_near_pairs(
                docs, "doc_id", "text", max_hamming=3, max_chunk_freq=cap
            )
        )
        staged = _rows(
            simhash_near_pairs_staged(
                docs, "doc_id", "text", max_hamming=3, max_chunk_freq=cap
            )
        )
        assert staged == naive, f"cap={cap}"
        assert naive  # the fixture must actually produce pairs


def test_simhash_pairs_staged_equals_naive_on_parquet(spark):
    from c99_vectordb_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_near_pairs_staged,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    naive = _rows(simhash_near_pairs(docs, "doc_id", "text", max_hamming=3))
    staged = _rows(
        simhash_near_pairs_staged(docs, "doc_id", "text", max_hamming=3)
    )
    assert staged == naive


def test_tier_pruning_rules_preserve_topk_model():
    """Pure-Python model check of the pruning PROOF (no Spark): over
    hundreds of random cluster structures — duplicate clusters of
    random sizes, random candidate-cluster sets (self always present
    for k>=2, like the real bucket self-match), random small-integer
    measures dense with ties — the dense_rank<=k tier keep plus the
    k+1-smallest-member cap must reproduce every point's naive top-k
    by (m ASC, id ASC) EXACTLY, including the candidate-count gates.
    The Spark fixtures prove the implementation matches the rules;
    this proves the rules themselves can't be beaten by a shape the
    hand fixtures didn't think of."""
    import random

    rng = random.Random(0xC99)
    for case in range(400):
        n_clusters = rng.randint(1, 6)
        sizes = [rng.randint(1, 5) for _ in range(n_clusters)]
        # interleaved ids across clusters
        members: dict[int, list[int]] = {c: [] for c in range(n_clusters)}
        nid = 0
        for r in range(max(sizes)):
            for c in range(n_clusters):
                if r < sizes[c]:
                    members[c].append(nid)
                    nid += 1
        k = rng.randint(1, 5)
        cand: dict[int, dict[int, int]] = {}
        for a in range(n_clusters):
            cand[a] = {}
            for b in range(n_clusters):
                if a == b:
                    if sizes[a] >= 2:
                        cand[a][b] = rng.randint(0, 4)
                elif rng.random() < 0.7:
                    cand[a][b] = rng.randint(0, 4)
        cluster_of = {p: c for c, ps in members.items() for p in ps}

        def naive_topk(p):
            a = cluster_of[p]
            rows = [
                (m, q)
                for b, m in cand[a].items()
                for q in members[b]
                if q != p
            ]
            rows.sort()
            return rows[:k]

        # the pruned edge set per the two rules
        pruned_rows: dict[int, list[tuple[int, int]]] = {
            p: [] for p in cluster_of
        }
        for a in range(n_clusters):
            tiers = sorted(set(cand[a].values()))
            kept_m = set(tiers[:k])
            for b, m in cand[a].items():
                if m not in kept_m:
                    continue
                capped = sorted(members[b])[: k + 1]
                for p in members[a]:
                    for q in capped:
                        if q != p:
                            pruned_rows[p].append((m, q))
        for p in cluster_of:
            got = sorted(pruned_rows[p])[:k]
            assert got == naive_topk(p), (
                f"case {case}: point {p}: {got} != {naive_topk(p)} "
                f"(sizes={sizes}, k={k}, cand={cand})"
            )
