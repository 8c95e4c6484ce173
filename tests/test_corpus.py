"""Corpus-preparation operators: invariants + plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from c99_vectordb_spark.operators import corpus as C


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_vocab_counts_match_python(spark):
    rows = [(1, "the cat sat on the mat"), (2, "the dog"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.token: (r.tf, r.df) for r in C.vocab_counts(df, "doc_id", "text").collect()}
    assert got["the"] == (3, 2)
    assert got["cat"] == (1, 1)
    assert "" not in got


def test_tfidf_rank_orders_by_tf_then_rarity(spark):
    # 'aa' tf=3 beats 'bb' tf=2; 'cc' and 'dd' tie on tf=1 -> rarer first
    rows = [
        (1, "aa aa aa bb bb cc dd"),
        (2, "cc zz"),  # cc df=2, dd df=1 -> dd ranks above cc in doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    top = C.tfidf_top_terms(df, "doc_id", "text", k=4).collect()
    doc1 = sorted([r for r in top if r.id == 1], key=lambda r: r.rank)
    assert [r.term for r in doc1] == ["aa", "bb", "dd", "cc"]


def test_stratified_sample_deterministic_and_correct(spark, documents):
    rate = F.lit(3000)
    a = C.stratified_sample(documents, "source", "doc_id", rate)
    ids1 = {r.doc_id for r in a.select("doc_id").collect()}
    ids2 = {r.doc_id for r in a.select("doc_id").collect()}
    assert ids1 == ids2 and 0 < len(ids1) < documents.count()
    # membership is exactly the hash predicate (python recompute)
    from c99_vectordb_spark.hashing import token_hash

    rows = documents.select("doc_id", "source").collect()
    want = {
        r.doc_id
        for r in rows
        if token_hash(f"{r.source}:{r.doc_id}") % 10000 < 3000
    }
    assert ids1 == want


def test_stratified_sample_is_map_only(spark, documents):
    plan = _plan(C.stratified_sample(documents, "source", "doc_id", F.lit(3000)))
    assert "Exchange" not in plan


def test_pack_sequences_invariants(spark, documents):
    from c99_vectordb_spark.operators.textstats import token_counts

    counts = token_counts(documents, "doc_id", "text").select("id", "n_re_tokens")
    sized = documents.join(counts, documents.doc_id == counts.id).drop("id")
    packed = C.pack_sequences(sized, "source", "doc_id", "n_re_tokens", budget=512)
    rows = sorted(packed.collect(), key=lambda r: (r.stratum, r.id))
    by_stratum: dict[str, list] = {}
    for r in rows:
        by_stratum.setdefault(r.stratum, []).append(r)
    for grp in by_stratum.values():
        run = 0
        prev_bin = 0
        for r in grp:
            assert r.offset == run, "offset must be the pre-document cumsum"
            assert r.seq_bin == run // 512
            assert r.seq_bin >= prev_bin, "bins are monotone within a stratum"
            prev_bin = r.seq_bin
            run += r.n_tokens


def test_stratified_sample_is_stream_native(spark, documents, tmp_path):
    """The sampler is stateless map-only, so the SAME operator runs
    unchanged on a stream — and selects exactly the batch rows."""
    import os

    src = str(tmp_path / "src")
    documents.select("doc_id", "source").coalesce(2).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id LONG, source STRING")
        .parquet(src)
    )
    sampled = C.stratified_sample(stream, "source", "doc_id", F.lit(3000))
    q = (
        sampled.writeStream.format("memory")
        .queryName("sample_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM sample_out").collect()}
    want = {
        r.doc_id
        for r in C.stratified_sample(documents, "source", "doc_id", F.lit(3000))
        .select("doc_id")
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# hypothesis: corpus operators vs plain-Python references
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_sizes = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # stratum
        st.integers(min_value=0, max_value=50),    # n_tokens
    ),
    min_size=1,
    max_size=24,
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=_sizes, budget=st.sampled_from([1, 7, 32]))
def test_pack_sequences_matches_python_reference(spark, rows, budget):
    data = [(i, s, n) for i, (s, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "id LONG, src STRING, nt LONG")
    got = {
        r.id: (r.offset, r.seq_bin)
        for r in C.pack_sequences(df, "src", "id", "nt", budget).collect()
    }
    # python reference: per-stratum running offset in id order
    want = {}
    run: dict[str, int] = {}
    for i, s, n in sorted(data):
        off = run.get(s, 0)
        want[i] = (off, off // budget)
        run[s] = off + n
    assert got == want


_texts = st.lists(
    st.text(alphabet="ab1 _.", min_size=0, max_size=30), min_size=1, max_size=12
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=_texts)
def test_vocab_counts_match_python_reference(spark, texts):
    import re
    from collections import Counter

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        r.token: (r.tf, r.df) for r in C.vocab_counts(df, "doc_id", "text").collect()
    }
    tf: Counter = Counter()
    dfc: Counter = Counter()
    for t in texts:
        toks = re.findall(r"[a-z0-9_]+", t.lower())
        tf.update(toks)
        dfc.update(set(toks))
    assert got == {tok: (tf[tok], dfc[tok]) for tok in tf}


def test_pack_global_matches_per_stratum_on_single_stratum(spark, documents):
    """On a single-stratum corpus the global pack must equal the
    per-stratum pack bin-for-bin (the parity that proves the stitched
    running sum implements the same algebra)."""
    from c99_vectordb_spark.operators import corpus as C
    from pyspark.sql import functions as F

    sized = documents.select(
        "doc_id", F.lit("only").alias("src"), (F.col("n_chars") % 700).alias("nt")
    )
    per = C.pack_sequences(sized, "src", "doc_id", "nt", budget=2048).select(
        "id", "n_tokens", "offset", "seq_bin"
    )
    glob = C.pack_sequences_global(sized, "doc_id", "nt", budget=2048)
    a = sorted(map(tuple, per.collect()))
    b = sorted(map(tuple, glob.collect()))
    assert a == b


def test_pack_global_plan_has_no_global_window(spark, documents):
    from c99_vectordb_spark.operators import corpus as C
    from pyspark.sql import functions as F
    import re

    sized = documents.select("doc_id", (F.col("n_chars") % 700).alias("nt"))
    plan = (
        C.pack_sequences_global(sized, "doc_id", "nt", budget=2048)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"windowspecdefinition\(([^,)]+)[,)]", plan):
        assert " ASC" not in m.group(1) and " DESC" not in m.group(1), plan


def test_chunk_documents_edges(spark):
    from c99_vectordb_spark.operators.corpus import chunk_documents
    import pytest as _pytest

    df = spark.createDataFrame(
        [
            (0, ""),
            (1, "one two three"),
            (2, " ".join(f"w{i}" for i in range(130))),
            # 49 tokens: start 48 would add a chunk whose single token is
            # already the tail of chunk 0's overlap — standard semantics
            # drop it (round-5 boundary rule)
            (3, " ".join(f"w{i}" for i in range(49))),
            # 65 tokens: start 48 contributes token 64 -> kept
            (4, " ".join(f"w{i}" for i in range(65))),
        ],
        "id long, body string",
    )
    out = chunk_documents(df, chunk_tokens=64, overlap_tokens=16)
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r.id, []).append(r)
    assert 0 not in by_id  # empty doc -> no chunks
    assert len(by_id[1]) == 1 and by_id[1][0].n_chunk_tokens == 3
    # 130 tokens, stride 48 -> starts 0, 48, 96
    assert [r.start_tok for r in sorted(by_id[2], key=lambda r: r.chunk_idx)] == [0, 48, 96]
    assert sorted(by_id[2], key=lambda r: r.chunk_idx)[-1].n_chunk_tokens == 34
    # overlap: chunk 1 starts 16 tokens before chunk 0 ends
    c0, c1 = sorted(by_id[2], key=lambda r: r.chunk_idx)[:2]
    assert c0.chunk_text.split()[48:] == c1.chunk_text.split()[:16]
    # fully-contained trailing chunk suppressed; new-token chunk kept
    assert [r.start_tok for r in by_id[3]] == [0]
    assert [r.start_tok for r in sorted(by_id[4], key=lambda r: r.chunk_idx)] == [0, 48]
    assert sorted(by_id[4], key=lambda r: r.chunk_idx)[-1].n_chunk_tokens == 17
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=16, overlap_tokens=16)


def test_decontaminate_drops_only_overlapping(spark):
    from c99_vectordb_spark.operators.corpus import decontaminate

    train = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "totally different words here")],
        "id long, body string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma epsilon")], "id long, body string"
    )
    out = decontaminate(train, ev, min_hits=1)
    assert [r.id for r in out.collect()] == [1]


def test_bpe_train_merges_hand_checked(spark):
    """Canonical BPE on a tiny corpus, fully hand-derived: word 'aaab'
    with freq 2. Pair counts weight every adjacent position (a|a twice
    per word), the 'a b' vs 'aa a' tie resolves by pair-string order,
    and training stops early when no pairs remain."""
    from c99_vectordb_spark.operators.corpus import bpe_train_merges

    df = spark.createDataFrame([(1, "aaab aaab")], "id long, text string")
    rows = [
        (r.merge_rank, r.pair, r.merged, r.cnt)
        for r in bpe_train_merges(df, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert rows == [
        (1, "a a", "aa", 4),
        (2, "a b", "ab", 2),
        (3, "aa ab", "aaab", 2),
    ]


def test_bpe_consecutive_pair_merge_not_skipped(spark):
    """The double-space separator invariant: merging (a, b) in 'abab'
    must merge BOTH occurrences in one pass (single-space separators
    would share the delimiter and skip every other match)."""
    from c99_vectordb_spark.operators.corpus import bpe_train_merges

    df = spark.createDataFrame([(1, "abab abab abab")], "id long, text string")
    rows = {
        r.merge_rank: (r.pair, r.merged, r.cnt)
        for r in bpe_train_merges(df, n_merges=2).collect()
    }
    # pairs of 'abab': a|b (x2), b|a (x1) per word, freq 3
    assert rows[1] == ("a b", "ab", 6)
    # after merging both a|b occurrences the word is 'ab ab'
    assert rows[2] == ("ab ab", "abab", 3)


def test_bpe_encode_counts_hand_checked(spark):
    """Encode with the merges learned on the same corpus: 'aaab' trains
    (a a)->aa, (a b)->ab, (aa ab)->aaab, so every 'aaab' encodes to ONE
    token; an unseen word only merges the rules that apply left-to-right."""
    from c99_vectordb_spark.operators.corpus import bpe_encode_counts

    df = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "ba"), (3, "")], "doc_id long, text string"
    )
    out = {
        r.id: (r.n_words, r.n_char_symbols, r.n_bpe_tokens)
        for r in bpe_encode_counts(df, n_merges=8).collect()
    }
    assert out[1] == (2, 8, 2)  # each 'aaab' -> the single merged token
    # 'ba' is in the training corpus too: rank-4 learns (b a)->ba
    assert out[2] == (1, 2, 1)
    assert out[3] == (0, 0, 0)


def test_bpe_encode_merge_count_monotone(spark, documents):
    """More merge rules can only shrink (or keep) the BPE token count,
    and 0 merges means one token per character."""
    from c99_vectordb_spark.operators.corpus import bpe_encode_counts

    e0 = bpe_encode_counts(documents, n_merges=0, top_words=50)
    e4 = bpe_encode_counts(documents, n_merges=4, top_words=50)
    j = (
        e0.select("id", F.col("n_bpe_tokens").alias("t0"), "n_char_symbols")
        .join(e4.select("id", F.col("n_bpe_tokens").alias("t4")), "id")
    )
    assert j.filter(F.col("t0") != F.col("n_char_symbols")).count() == 0
    assert j.filter(F.col("t4") > F.col("t0")).count() == 0
    # the merges must actually fire somewhere on the real corpus
    assert j.filter(F.col("t4") < F.col("t0")).count() > 0


def test_mixture_weights_caps_large_sources(spark):
    """Three sources of size 8/4/0... sizes 8, 4, 2 -> target = 4:
    the size-8 source gets weight 500000 ppm, smaller ones keep all."""
    rows = (
        [(i, "a " * 3, "big") for i in range(8)]
        + [(100 + i, "b " * 3, "mid") for i in range(4)]
        + [(200 + i, "c " * 3, "small") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from c99_vectordb_spark.operators.corpus import mixture_weights

    out = {r.source: r for r in mixture_weights(df).collect()}
    assert out["big"].weight_ppm == 4 * 1000000 // 8
    assert out["mid"].weight_ppm == 1000000
    assert out["small"].weight_ppm == 1000000
    # full-weight sources keep every doc; capped sources keep a subset
    assert out["mid"].n_sampled == 4 and out["small"].n_sampled == 2
    assert 0 <= out["big"].n_sampled <= 8
    # determinism: same input -> identical acceptance
    again = {r.source: r.n_sampled for r in mixture_weights(df).collect()}
    assert again == {s: r.n_sampled for s, r in out.items()}


def test_mixture_weights_sampled_matches_stratified_key(spark, documents):
    """The acceptance rule must agree with the shared sample_key spec:
    recompute n_sampled per source independently from the key."""
    from c99_vectordb_spark.operators.corpus import mixture_weights, sample_key

    out = mixture_weights(documents).collect()
    w = {r.source: r.weight_ppm for r in out}
    keyed = documents.select(
        "source", (sample_key(F.col("source"), F.col("doc_id")) % 1000000).alias("k")
    ).collect()
    expect: dict[str, int] = {}
    for r in keyed:
        if r.k < w[r.source]:
            expect[r.source] = expect.get(r.source, 0) + 1
    assert {r.source: r.n_sampled for r in out} == {
        s: expect.get(s, 0) for s in w
    }


def test_weighted_bottomk_favors_heavy_rows(spark):
    """Rows with weight 100 vs weight 1: the 100-heavy half must
    dominate a k=50 sample of 200 rows, and membership is exactly the
    recomputed key order (python twin)."""
    from c99_vectordb_spark.hashing import token_hash as py_hash
    from c99_vectordb_spark.operators.corpus import weighted_bottomk

    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = [(r.id, r.skey) for r in weighted_bottomk(df, "id", "w", k=50).collect()]
    heavy = sum(1 for i, _ in got if i % 2 == 0)
    assert heavy >= 40  # ~100x odds ratio: light rows are rare
    keys = sorted(
        ((py_hash(str(i)) * 2654435761) % 1000000007 // max(w, 1), i)
        for i, w in rows
    )[:50]
    assert sorted(got) == sorted((i, k) for k, i in keys)


def test_weighted_bottomk_stratified_is_partitioned(spark, documents):
    """Stratified variant: k rows per source through ONE partitioned
    window (plan has no unpartitioned window), sizes == min(k, |src|)."""
    from c99_vectordb_spark.operators.corpus import weighted_bottomk

    out = weighted_bottomk(
        documents, "doc_id", "n_chars", k=5, stratum_col="source"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(source" in plan or "windowspecdefinition(stratum" in plan
    sizes = {r.stratum: r.n for r in out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    src_sizes = {r.source: r.n for r in documents.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {s: min(5, n) for s, n in src_sizes.items()}


def test_bm25_topk_ranking_semantics(spark):
    # corpus: 'rare' appears only in docs 1-2; 'common' in every doc.
    # query = [rare, common]: doc 1 (rare x2) > doc 2 (rare x1) > the
    # common-only docs (idf of an everywhere-term clamps to ~0).
    rows = [
        (1, "rare rare common filler1 filler2"),
        (2, "rare common filler3 filler4 filler5"),
        (3, "common filler6 filler7 filler8 filler9"),
        (4, "common stuff more words here today"),
        (5, "common other text goes right here"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = C.bm25_topk(df, ["rare", "common"], "doc_id", "text", k=5).collect()
    ids = [r.id for r in out]
    assert ids[0] == 1 and ids[1] == 2
    scores = {r.id: r.score_q26 for r in out}
    assert scores[1] > scores[2] > scores[3]
    # n_terms counts matched query terms per doc
    nt = {r.id: r.n_terms for r in out}
    assert nt[1] == 2 and nt[3] == 1


def test_bm25_topk_no_hits_empty(spark):
    df = spark.createDataFrame([(1, "alpha beta")], "doc_id LONG, text STRING")
    assert C.bm25_topk(df, ["missing"], "doc_id", "text").count() == 0


def test_bm25_length_normalization(spark):
    # same tf of the query term; shorter doc scores higher (b=0.75)
    rows = [
        (1, "term " + " ".join(f"f{i}" for i in range(4))),
        (2, "term " + " ".join(f"g{i}" for i in range(40))),
        (3, "unrelated words without the query token"),
        (4, "more unrelated padding text entirely distinct"),
        (5, "yet another filler document for idf headroom"),
        (6, "final background document keeps df below half"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r.id: r.score_q26 for r in C.bm25_topk(df, ["term"], "doc_id", "text").collect()}
    assert out[1] > out[2]


def test_curriculum_buckets_per_source(spark, tmp_path):
    # runs the SHIPPED registry query end to end on a constructed
    # documents table (review finding: the earlier version re-built the
    # ntile window inline, testing Spark against itself).
    from c99_vectordb_spark.queries_ext import q_corpus_curriculum

    # identical per-token stats -> equal quality_q16 -> ntile(10) order
    # falls to the doc_id tie-break; 8 docs over 10 buckets = one each
    rows = [(i, "wordy " * (i + 3), "s0") for i in range(8)] + [
        (10, "lone doc", "s1")
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r.bucket for r in q_corpus_curriculum(spark, str(tmp_path)).collect()}
    assert [out[i] for i in range(8)] == [i + 1 for i in range(8)]
    assert out[10] == 1  # lone doc in s1 lands in bucket 1


def test_rollup_merge_associative_and_matches_direct(spark):
    from c99_vectordb_spark.operators import rollup as R

    rows = [
        (1, 0, "a", 1.25),
        (2, 1800 * 1000000, "a", 2.50),       # same hour as 1
        (3, 7200 * 1000000, "b", -3.75),
        (4, 7200 * 1000000, "a", 0.125),
        (5, 7200 * 1000000 + 1, "a", 10.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts_us LONG, event_type STRING, value DOUBLE"
    )
    direct = R.rollup_report(R.hourly_rollup(ev)).collect()

    def split(pred):
        return R.hourly_rollup(ev.filter(pred))

    two = R.rollup_report(
        R.merge_rollups(split(F.col("event_id") % 2 == 0), split(F.col("event_id") % 2 == 1))
    ).collect()
    three = R.rollup_report(
        R.merge_rollups(
            split(F.col("event_id") == 5),
            split(F.col("event_id") <= 2),
            split((F.col("event_id") > 2) & (F.col("event_id") < 5)),
        )
    ).collect()
    key = lambda r: (r.hour_idx, r.event_type)  # noqa: E731
    assert sorted(map(tuple, two), key=lambda t: t[:2]) == sorted(
        map(tuple, direct), key=lambda t: t[:2]
    )
    assert sorted(map(tuple, three), key=lambda t: t[:2]) == sorted(
        map(tuple, direct), key=lambda t: t[:2]
    )
    byk = {key(r): r for r in direct}
    assert byk[(0, "a")].cnt == 2 and byk[(0, "a")].sum_value == 3.75
    assert byk[(2, "a")].min_value == 0.125 and byk[(2, "a")].max_value == 10.0


# ---------------------------------------------------------------------------
# hypothesis: integer BM25 vs a Python reference of the quantized formula
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_bm25_corpora = st.lists(
    st.lists(st.sampled_from(["q1", "q2", "x", "y", "z"]), min_size=1, max_size=15).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)


def _bm25_reference(texts, terms, k):
    import re
    from collections import Counter

    docs = {i: re.findall(r"[a-z0-9_]+", t.lower()) for i, t in enumerate(texts)}
    n_docs = len(docs)
    t_tokens = sum(len(v) for v in docs.values())
    avgdl_m = 1000 * t_tokens // n_docs
    dfq = Counter()
    for toks in docs.values():
        for t in set(toks) & set(terms):
            dfq[t] += 1
    rows = []
    for i, toks in docs.items():
        dl = len(toks)
        tf = Counter(t for t in toks if t in terms)
        if not tf:
            continue
        score = 0
        for t, f in tf.items():
            ratio_m = 1000000 * dl // avgdl_m
            denom_m = 1000 * f + (1200 * (250 + (750 * ratio_m) // 1000)) // 1000
            tf_q16 = (65536 * 2200 * f) // denom_m
            r = max(((2 * (n_docs - dfq[t]) + 1) * 1048576) // (2 * dfq[t] + 1), 1)
            msb = r.bit_length() - 1
            idf_q10 = max((msb - 20) * 1024 + ((r - (1 << msb)) * 1024) // (1 << msb), 0)
            score += tf_q16 * idf_q10
        rows.append((i, score, len(tf)))
    rows.sort(key=lambda x: (-x[1], x[0]))
    return rows[:k]


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=_bm25_corpora)
def test_bm25_matches_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = [
        (r.id, r.score_q26, r.n_terms)
        for r in C.bm25_topk(df, ["q1", "q2"], "doc_id", "text", k=4).collect()
    ]
    assert got == _bm25_reference(texts, ["q1", "q2"], 4)


def test_bm25_batch_matches_single_query(spark):
    # a one-query batch must reproduce bm25_topk's ranking exactly
    rows = [
        (1, "rare rare common filler1 filler2"),
        (2, "rare common filler3 filler4 filler5"),
        (3, "common filler6 filler7 filler8 filler9"),
        (4, "common stuff more words here today"),
        (5, "other text entirely without matches"),
        (6, "and one more background document here"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    single = [
        (r.id, r.score_q26, r.n_terms)
        for r in C.bm25_topk(df, ["rare", "common"], "doc_id", "text", k=4).collect()
    ]
    qdf = spark.createDataFrame([(7, "rare"), (7, "common")], "qid LONG, term STRING")
    batch = [
        (r.id, r.score_q26, r.n_terms)
        for r in C.bm25_topk_batch(df, qdf, "doc_id", "text", k=4)
        .orderBy("rank")
        .collect()
    ]
    assert batch == single


def test_postings_partition_invariance(spark):
    """The two-stage bottom-k must be independent of physical
    partitioning (the local bottom-k union argument) and match a
    direct python reference."""
    import re

    rows = [(i, " ".join(f"t{(i + j) % 7}" for j in range(4))) for i in range(40)]
    want = {}
    for i, t in rows:
        for tok in set(re.findall(r"[a-z0-9_]+", t)):
            want.setdefault(tok, []).append(i)
    want = {
        t: (len(ids), tuple(sorted(ids)[:5]))
        for t, ids in want.items()
        if len(ids) >= 2
    }
    for nparts in (1, 3, 11):
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(
            nparts
        )
        got = {
            r.term: (r.df, tuple(r.postings))
            for r in C.postings(df, max_postings=5).collect()
        }
        assert got == want, f"nparts={nparts}"
