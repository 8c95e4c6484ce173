"""Dedup operator semantics on controlled corpora (the oracle queries
check cross-engine parity; these check the *meaning*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.operators import dedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "The  quick   brown fox jumps over the lazy dog"),  # ws/case dup of 0
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup (1 token)
        (4, "completely different text about database engines"),
        (5, "spark catalyst optimizer rewrites logical plans"),
    ]
    return spark.createDataFrame(rows, ["id", "body"])


def test_exact_dedup_keeps_min_id(spark, corpus):
    out = {r.id: r for r in D.exact_dedup(corpus).collect()}
    assert 0 in out and out[0].dup_cnt == 3  # 0, 1, 2 collapse
    assert 1 not in out and 2 not in out
    assert {3, 4, 5} <= set(out)


def test_jaccard_finds_near_dups(spark, corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    # exact dups: jaccard 1.0
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == 1.0
    # 1-token-edit neighbor: high but < 1
    assert 0.5 <= pairs[(0, 3)] < 1.0
    # unrelated docs absent
    assert (0, 4) not in pairs and (4, 5) not in pairs


def test_minhash_lsh_candidates_superset_of_high_jaccard(spark, corpus):
    cands = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(corpus).collect()}
    # identical shingle sets always collide on every band
    assert (0, 1) in cands and (0, 2) in cands


def test_simhash_identical_docs_same_signature(spark, corpus):
    sigs = {r.id: r.sim for r in D.simhash(corpus).collect()}
    assert sigs[0] == sigs[1] == sigs[2]
    assert sigs[0] != sigs[4]
    assert all(0 <= s < (1 << D.SIMHASH_BITS) for s in sigs.values())


def test_simhash_near_pairs_hamming(spark, corpus):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_near_pairs(corpus, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] == 0


def test_cosine_top_pairs_orders_desc(spark, embeddings):
    emb = embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    out = D.cosine_top_pairs(emb, k=10).collect()
    assert len(out) == 10
    scores = [r.cos for r in out]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# pair -> survivor resolution (connected components)
# ---------------------------------------------------------------------------

def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a LONG, id_b LONG")


def test_resolve_duplicates_chain_star_isolated(spark):
    """Chain 1-2-3-4-5, star 10-{11,12,13}, isolated pair (20,21):
    every member maps to its component minimum."""
    pairs = _pairs_df(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13), (20, 21)],
    )
    got = {r.id: r.canonical_id for r in D.resolve_duplicates(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_resolve_duplicates_long_chain_converges(spark):
    """A 40-node chain needs pointer jumping to converge within the
    iteration bound; min label must still flood to the far end."""
    pairs = _pairs_df(spark, [(i, i + 1) for i in range(40)])
    got = {r.id: r.canonical_id for r in D.resolve_duplicates(pairs, max_iter=12).collect()}
    assert len(got) == 41
    assert set(got.values()) == {0}


def test_resolve_duplicates_distributed_path_matches_unionfind(spark):
    """small_graph_edges=0 forces the distributed pointer-jumping loop;
    its labels must equal the driver union-find's on an awkward graph
    (two chains merged by a cross edge + a star + isolated pairs)."""
    edges = (
        [(i, i + 1) for i in range(0, 30, 2)]
        + [(i, i + 1) for i in range(100, 130, 2)]
        + [(3, 101), (200, 201), (200, 202), (300, 301)]
    )
    pairs = _pairs_df(spark, edges)
    small = {
        r.id: r.canonical_id for r in D.resolve_duplicates(pairs).collect()
    }
    dist = {
        r.id: r.canonical_id
        for r in D.resolve_duplicates(pairs, small_graph_edges=0).collect()
    }
    assert dist == small
    assert len(dist) == len({n for e in edges for n in e})


def test_survivors_pair_closed(spark, corpus):
    """No surviving pair: for every input near-dup pair at most one
    endpoint survives, and untouched docs all survive."""
    pairs = D.minhash_lsh_pairs(corpus)
    comps = D.resolve_duplicates(pairs)
    surv = {r.id for r in D.dedup_survivors(corpus, comps).collect()}
    pair_rows = [(r.id_a, r.id_b) for r in pairs.collect()]
    assert pair_rows, "fixture must produce at least one near-dup pair"
    for a, b in pair_rows:
        assert not (a in surv and b in surv), f"surviving pair ({a},{b})"
    paired = {x for p in pair_rows for x in p}
    all_ids = {r.id for r in corpus.select(F.col("id")).collect()}
    assert (all_ids - paired) <= surv  # untouched docs always survive
    # exactly one survivor per component
    comp_rows = comps.collect()
    by_comp = {}
    for r in comp_rows:
        by_comp.setdefault(r.canonical_id, []).append(r.id)
    for canon, members in by_comp.items():
        assert [m for m in members if m in surv] == [canon]


# ---------------------------------------------------------------------------
# SimHash candidate-set scale guards
# ---------------------------------------------------------------------------

def _pseudo_random_corpus(spark, n_docs=400, words_per_doc=30):
    """Deterministic corpus of distinct word soup: signatures behave
    like random 60-bit values, so chunk collisions measure the FALSE
    candidate rate of the banding scheme."""
    rows = []
    for i in range(n_docs):
        words = [f"w{(i * 131 + j * 17) % 99991:05d}x{j}" for j in range(words_per_doc)]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "id LONG, body STRING")


def test_simhash_candidate_count_bounded(spark):
    """15-bit chunks must keep the candidate join output a tiny
    fraction of all-pairs on a non-duplicated corpus — the 100 TB
    scale property of the banding scheme."""
    corpus = _pseudo_random_corpus(spark)
    n = corpus.count()
    sigs = D.simhash(corpus).cache()
    chunk_bits = D.SIMHASH_BITS // 4
    chunks = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("sim", chunk_bits * c)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("cval"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "c.chunk", "c.cval")
    a, b = chunks.alias("a"), chunks.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id"), F.col("b.id"))
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    assert candidates < all_pairs * 0.01, (candidates, all_pairs)
    # and none of these random docs verify as near-dups
    assert D.simhash_near_pairs(corpus).count() == 0


def test_simhash_max_chunk_freq_knob(spark, corpus):
    """The skew cap yields a subset of the unbounded pairs; with a
    loose cap the results are identical."""
    unbounded = {
        (r.id_a, r.id_b) for r in D.simhash_near_pairs(corpus).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(corpus, max_chunk_freq=2).collect()
    }
    loose = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(corpus, max_chunk_freq=10_000).collect()
    }
    assert capped <= unbounded
    assert loose == unbounded


def test_duplicate_spans_semantics(spark):
    # docs 0 and 1 share tokens "a1..a8" verbatim at different offsets;
    # doc 2 is unrelated. window=4 -> shared windows are exactly the
    # rolling 4-grams inside the 8-token repeat.
    shared = " ".join(f"a{i}" for i in range(8))
    rows = [
        (0, f"{shared} tail0 tail1 tail2"),
        (1, f"lead0 lead1 {shared}"),
        (2, "nothing in common with the others at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["id", "body"])
    spans = {r.id: r for r in D.duplicate_spans(df, window=4).collect()}
    assert set(spans) == {0, 1}
    # doc 0: repeat at tokens [0, 8); 5 windows of size 4
    assert (spans[0].span_start, spans[0].span_end, spans[0].n_windows) == (0, 8, 5)
    # doc 1: same repeat shifted by the 2-token lead
    assert (spans[1].span_start, spans[1].span_end, spans[1].n_windows) == (2, 10, 5)


def test_duplicate_spans_merges_adjacent_and_splits_gaps(spark):
    # one doc carries TWO disjoint repeats of doc 3's content -> two
    # spans, not one merged span.
    r1 = " ".join(f"x{i}" for i in range(5))
    r2 = " ".join(f"y{i}" for i in range(5))
    rows = [
        (0, f"{r1} filler1 filler2 filler3 {r2}"),
        (1, r1),
        (2, r2),
    ]
    df = spark.createDataFrame(rows, ["id", "body"])
    out = sorted(
        (r.id, r.span_start, r.span_end)
        for r in D.duplicate_spans(df, window=5).collect()
    )
    assert out == [(0, 0, 5), (0, 8, 13), (1, 0, 5), (2, 0, 5)]


def test_duplicate_spans_short_docs_no_windows(spark):
    rows = [(0, "too short"), (1, "too short")]
    df = spark.createDataFrame(rows, ["id", "body"])
    assert D.duplicate_spans(df, window=16).count() == 0


def test_incremental_dedup_dispositions(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    # one appended token: high shingle overlap, verified offline to
    # share 4/4 MinHash bands under the fixed hash constants
    near = base + "cat"
    corpus = spark.createDataFrame(
        [(100, base), (101, "standing corpus filler document body")], ["id", "body"]
    )
    batch = spark.createDataFrame(
        [
            (1, base),  # exact dup of corpus 100
            (2, base),  # also exact-corpus (corpus precedence over batch)
            (3, near),  # high-overlap near dup
            (4, "completely unrelated fresh content about engines"),
            (5, "novel content appearing twice in this batch only"),
            (6, "novel content appearing twice in this batch only"),
        ],
        ["id", "body"],
    )
    seen_fps = D.exact_dedup(corpus).select("fp")
    seen_bands = D.minhash_bands(corpus).select("band", "bsig")
    out = {
        r.id: r.disposition
        for r in D.incremental_dedup(batch, seen_fps, seen_bands).collect()
    }
    assert out[1] == "exact_dup_corpus"
    assert out[2] == "exact_dup_corpus"
    assert out[4] == "kept"
    assert out[5] == "kept"
    assert out[6] == "exact_dup_batch"
    assert out[3] == "near_dup_corpus"


def test_cross_source_matrix_symmetric_counts(spark):
    # near-identical docs across two sources -> one (a, b) cell;
    # least/greatest folds both directions into the same cell
    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [(1, base, "a"), (2, base, "b"), (3, base + "cat", "b"),
         (4, "entirely unrelated text body", "a")],
        ["doc_id", "text", "source"],
    )
    import tempfile

    from c99_vectordb_spark.queries_ext import q_dedup_cross_source

    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(f"{tmp}/documents.parquet")
        out = {
            (r.src_a, r.src_b): r.n_pairs
            for r in q_dedup_cross_source(spark, tmp).collect()
        }
    # (1,2) and (1,3) cross a-b; (2,3) within b
    assert out[("a", "b")] == 2
    assert out[("b", "b")] == 1


def test_remove_duplicate_spans_rewrites_later_copies(spark):
    shared = " ".join(f"a{i}" for i in range(8))
    rows = [
        (0, f"{shared} tail0 tail1"),       # canonical: untouched
        (1, f"lead0 lead1 {shared}"),       # loses the 8-token repeat
        (2, "unique body stays intact ok"), # untouched
        (3, shared),                        # fully removed
    ]
    df = spark.createDataFrame(rows, ["id", "body"])
    out = {r.id: r for r in D.remove_duplicate_spans(df, window=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0].clean_text == f"{shared} tail0 tail1" and out[0].n_removed == 0
    assert out[1].clean_text == "lead0 lead1" and out[1].n_removed == 8
    assert out[2].clean_text == "unique body stays intact ok"
    assert out[3].clean_text == "" and out[3].n_tokens == 0 and out[3].n_removed == 8


def test_duplicate_spans_near_gap_merges_no_overlap(spark):
    # doc 0 = t0..t5; doc 1 matches its first 4 tokens, doc 2 its last
    # 4; no doc matches the middle window. Duplicated positions in doc
    # 0 are {0, 2} — gap 2 < window — so they are ONE region [0, 6),
    # not two overlapping spans [0,4)+[2,6) (review finding: summing
    # span lengths must never double-count tokens).
    rows = [
        (0, "t0 t1 t2 t3 t4 t5"),
        (1, "t0 t1 t2 t3"),
        (2, "t2 t3 t4 t5"),
    ]
    df = spark.createDataFrame(rows, ["id", "body"])
    spans = sorted(
        (r.id, r.span_start, r.span_end, r.n_windows)
        for r in D.duplicate_spans(df, window=4).collect()
    )
    assert spans == [(0, 0, 6, 2), (1, 0, 4, 1), (2, 0, 4, 1)]


# ---------------------------------------------------------------------------
# hypothesis: substring dedup vs a brute-force Python reference
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_corpora = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=12).map(
        lambda toks: " ".join(toks)
    ),
    min_size=1,
    max_size=6,
)


def _spans_reference(texts, w):
    """Brute-force: duplicated windows by literal token-tuple equality,
    then non-overlapping run merge with the gap < w rule."""
    import re

    docs = {i: re.findall(r"[a-z0-9_]+", t.lower()) for i, t in enumerate(texts)}
    owner: dict[tuple, set] = {}
    for i, toks in docs.items():
        for p in range(len(toks) - w + 1):
            owner.setdefault(tuple(toks[p : p + w]), set()).add(i)
    out = []
    for i, toks in docs.items():
        dup_pos = sorted(
            p
            for p in range(len(toks) - w + 1)
            if len(owner[tuple(toks[p : p + w])]) >= 2
        )
        run = []
        for p in dup_pos:
            if run and p - run[-1] < w:
                run.append(p)
            else:
                if run:
                    out.append((i, run[0], run[-1] + w, len(run)))
                run = [p]
        if run:
            out.append((i, run[0], run[-1] + w, len(run)))
    return sorted(out)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=_corpora, w=st.sampled_from([2, 3]))
def test_duplicate_spans_matches_python_reference(spark, texts, w):
    df = spark.createDataFrame(list(enumerate(texts)), "id LONG, body STRING")
    got = sorted(
        (r.id, r.span_start, r.span_end, r.n_windows)
        for r in D.duplicate_spans(df, window=w).collect()
    )
    assert got == _spans_reference(texts, w)


def test_staged_jaccard_equals_naive_on_duplicate_heavy_corpus(spark):
    """staged_jaccard_pairs must produce EXACTLY the naive relation on
    a corpus with dense exact-duplicate clusters (the case it exists
    for): 4 copies each of a handful of base texts plus near-dup
    variants and unrelated noise — covering within-cluster pairs
    (jaccard 1.0), cross-cluster near-dup expansion, a shingle-less
    blank cluster (must emit NO pairs), and singletons."""
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy cat again and again",
        "completely different content about spark query planning here",
        "",
    ]
    rows = []
    i = 0
    for text in base:
        for _ in range(4):
            rows.append((i, text))
            i += 1
    rows += [(i, "a lone singleton document with its own words"),
             (i + 1, "another unrelated text body entirely")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    naive = sorted(
        map(tuple, D.ngram_jaccard_pairs(
            df, id_col="doc_id", body_col="text", threshold=0.5
        ).collect())
    )
    staged = sorted(
        map(tuple, D.staged_jaccard_pairs(
            df, id_col="doc_id", body_col="text", threshold=0.5
        ).collect())
    )
    assert staged == naive
    # the fixture must actually exercise every path
    ones = [p for p in naive if p[2] == 1.0]
    cross = [p for p in naive if p[2] < 1.0]
    assert len(ones) >= 2 * 6  # two live clusters x C(4,2)
    assert cross, "fixture lost its near-dup cross-cluster pairs"


def test_staged_containment_equals_naive_on_duplicate_heavy_corpus(spark):
    """Directed-containment twin of the staged-jaccard equality test:
    same duplicate-heavy fixture, same exactness demand — including
    the k*(k-1) within-cluster 1e6-ppm pairs and the blank cluster
    emitting nothing."""
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again plus a longer tail of extra words",
        "completely different content about spark query planning here",
        "",
    ]
    rows = []
    i = 0
    for text in base:
        for _ in range(4):
            rows.append((i, text))
            i += 1
    rows += [(i, "a lone singleton document with its own words")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    naive = sorted(
        map(tuple, D.ngram_containment_pairs(
            df, id_col="doc_id", body_col="text", threshold_ppm=500_000
        ).collect())
    )
    staged = sorted(
        map(tuple, D.staged_containment_pairs(
            df, id_col="doc_id", body_col="text", threshold_ppm=500_000
        ).collect())
    )
    assert staged == naive
    within = [p for p in naive if p[2] == 1_000_000]
    assert len(within) >= 2 * 4 * 3  # >= two live clusters x k(k-1)
