"""Corpus-preparation operators for LLM training-data pipelines.

The dedup family (operators/dedup.py) removes near-copies; these
operators cover the rest of a corpus build at 100 TB: vocabulary
statistics, per-document salient terms, reproducible sampling, and
sequence packing. Everything is exact-integer or exact-decimal so the
DuckDB oracle twins hash-match (repo float conventions); no rand() —
sampling keys off the stable polynomial hash (hashing.py), so a re-run
over the same corpus picks the same rows on any cluster size.

Scale notes:
- vocab/tfidf shuffle on the token — partial aggregation makes the
  shuffle vocabulary-sized, not corpus-sized; the df (document
  frequency) side of tfidf is a vocabulary-sized aggregate joined
  back by token.
- stratified_sample is map-only: hash-mod per row against a
  per-stratum threshold. No shuffle, no coordination, reproducible.
- pack_sequences windows per stratum: each stratum's running token
  total parallelizes across strata; a single global pack would need
  repartitionByRange + a scan-order contract instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import token_hash, tokens


def vocab_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    top_n: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: (token, tf, df) — total term frequency and
    document frequency. Explode -> two-level aggregate; the shuffle
    carries (token, partial counts). ``top_n`` keeps the most frequent
    tokens (ties broken by token asc) via TakeOrderedAndProject."""
    tok = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(body_col))).alias("token"))
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("_id").alias("df"),
    )
    if top_n is not None:
        counts = counts.orderBy(F.desc("tf"), F.asc("token")).limit(top_n)
    return counts


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k salient terms: rank by (tf DESC, df ASC,
    term ASC) — the tf-idf ordering with the idf comparison done on
    the raw df integer, so the output is integer-exact cross-engine
    (no float idf to round). Returns (id, term, tf, df, rank).

    The df table is a vocabulary-sized aggregate — broadcast back onto
    the per-document term counts (vocabulary ~1e6-1e8 rows at 100 TB;
    if it outgrows broadcast, drop the hint and it becomes a token-
    keyed shuffle join, still vocabulary-bounded)."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(body_col))).alias("term")
    )
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.count_distinct("id").alias("df"))
    w = Window.partitionBy("id").orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "df", F.col("rank").cast("long").alias("rank"))
    )


def sample_key(stratum: Column, id_: Column) -> Column:
    """The deterministic sampling key: polynomial hash of
    '<stratum>:<id>' — stable across runs, partitionings, and engines
    (DuckDB twin: duckdb_sample_key_sql)."""
    return token_hash(F.concat_ws(":", stratum, id_.cast("string")))


def duckdb_sample_key_sql(stratum_expr: str, id_expr: str) -> str:
    from ..hashing import duckdb_token_hash_sql

    key = f"({stratum_expr} || ':' || CAST({id_expr} AS VARCHAR))"
    return duckdb_token_hash_sql(key)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rate_bp: Column,
) -> DataFrame:
    """Reproducible per-stratum sampling WITHOUT rand(): keep a row iff
    hash(stratum:id) % 10000 < rate_bp (basis points, may vary by
    stratum). Map-only — no shuffle, no seed state; re-runs and
    backfills select identical rows, and the rate can be tuned per
    stratum (e.g. downweight a crawl, keep all of a curated set).
    Adds the sampling key as `skey` for auditability."""
    key = sample_key(F.col(stratum_col), F.col(id_col)) % 10000
    return df.withColumn("skey", key).filter(F.col("skey") < rate_bp)


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "id",
    body_col: str = "body",
    n: int = 3,
) -> DataFrame:
    """Benchmark-decontamination probe: for each training document, the
    number of distinct hashed token n-grams it shares with ANY eval
    document — the GPT-3/Pile-style n-gram-collision test.

    Plan: both corpora shingle map-only (dedup.shingles, Arrow UDF,
    per-doc distinct inside the batch); the eval side collapses to its
    DISTINCT shingle set (eval sets are small — benchmark suites, not
    corpora — so AQE broadcasts it); one equi-join on the shingle hash
    and a per-doc count. Shuffle volume is shingle-keyed longs, never
    documents. Returns (id, hits) for contaminated docs only.
    """
    from .dedup import shingles

    tr = shingles(train, id_col, body_col, n)
    ev = shingles(eval_df, id_col, body_col, n).select("sh").distinct()
    return (
        tr.join(ev, "sh")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "id",
    body_col: str = "body",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Drop training documents overlapping the eval set by at least
    ``min_hits`` distinct n-grams (anti-join on the contaminated id
    set — ships only ids, broadcast when small)."""
    bad = contamination_hits(train, eval_df, id_col, body_col, n).filter(
        F.col("hits") >= min_hits
    )
    return train.join(
        bad.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "id",
    body_col: str = "body",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preprocessing step (RAG indexing, long-doc training).

    Pure JVM: tokenize once, posexplode a sequence of chunk starts
    (stride = chunk - overlap), slice the token array per chunk. No
    Python, no shuffle — a map-only fan-out whose output is bounded by
    total tokens / stride. Empty documents produce no chunks. Returns
    (id, chunk_idx, start_tok, n_chunk_tokens, chunk_text).

    Standard-chunker boundary rule: a non-first chunk is emitted only
    if it contributes at least one NEW token (start + overlap < n) —
    without this, a doc with n in (k*stride, k*stride + overlap] would
    end with a trailing chunk fully contained in its predecessor (a
    49-token doc at 64/16 would add a redundant 1-token chunk). Only
    the final start can violate the rule, so chunk_idx stays dense.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    step = chunk_tokens - overlap_tokens
    toks = tokens(F.col(body_col))
    with_toks = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_toks") - 1, F.lit(0)), F.lit(step)
    )
    return (
        with_toks.select(
            "id",
            F.size("_toks").alias("_n"),
            "_toks",
            F.posexplode(starts).alias("chunk_idx", "start_tok"),
        )
        .filter(
            (F.col("start_tok") < F.col("_n"))
            & (
                (F.col("start_tok") == 0)
                | (F.col("start_tok") + overlap_tokens < F.col("_n"))
            )
        )
        .select(
            "id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.least(
                F.lit(chunk_tokens), (F.col("_n") - F.col("start_tok"))
            ).cast("long").alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("start_tok") + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences:
    within each stratum (ordered by id), a document starts in the bin
    its running token offset falls into — bin = floor(offset/budget)
    where offset excludes the document itself. Contiguous, determin-
    istic, one window per stratum; documents longer than the budget
    still get a bin (they'd be chunked downstream). Returns
    (id, stratum, n_tokens, offset, seq_bin)."""
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nt = F.col(n_tokens_col).cast("long")
    offset = F.sum(nt).over(w) - nt
    return df.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
        nt.alias("n_tokens"),
        offset.alias("offset"),
        F.floor(offset / F.lit(budget)).cast("long").alias("seq_bin"),
    )


def pack_sequences_global(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
) -> DataFrame:
    """GLOBAL sequence packing: one contiguous bin sequence over the
    whole corpus in id order, no stratum partitioning — the layout for
    a final shuffled-and-frozen training corpus where bins must be
    globally dense.

    Per-stratum :func:`pack_sequences` parallelizes over strata; this
    variant has no partition key, so the running token offset uses the
    two-pass range-partition stitch (scalable_window.running_sum:
    per-partition local window + a broadcast prefix-total) instead of
    an unpartitioned global window. Returns (id, n_tokens, offset,
    seq_bin); on a single-stratum corpus it equals pack_sequences
    exactly (parity-tested)."""
    from .scalable_window import running_sum

    nt = F.col(n_tokens_col).cast("long")
    sized = df.select(F.col(id_col).alias("id"), nt.alias("n_tokens"))
    summed = running_sum(
        sized, [F.col("id").asc()], F.col("n_tokens"), out_col="cum"
    )
    offset = F.col("cum") - F.col("n_tokens")
    return summed.select(
        "id",
        "n_tokens",
        offset.alias("offset"),
        F.floor(offset / F.lit(budget)).cast("long").alias("seq_bin"),
    )


def bpe_train_merges(
    df: DataFrame,
    body_col: str = "text",
    n_merges: int = 8,
    top_words: int = 400,
) -> DataFrame:
    """Distributed mini-BPE trainer: learn the first ``n_merges`` merge
    rules over the corpus word-frequency table — the canonical
    iterative training-data algorithm (count adjacent symbol pairs ->
    argmax merge -> apply -> repeat), expressed as driver-looped
    DataFrame ops with NO Python UDFs.

    Per iteration: one vocabulary-sized shuffle (pair counts) and a
    ONE-ROW collect (the argmax), so the driver traffic is O(n_merges)
    regardless of corpus size; the word table itself is capped at
    ``top_words`` rows by (freq DESC, word ASC) and cached once. At
    100 TB the only corpus-sized stage is the initial token explode.

    Cross-engine exactness trick: symbols are joined with DOUBLE
    spaces (" a  b  c  "). A literal non-overlapping left-to-right
    replace of " x  y " with " xy " then merges consecutive
    occurrences exactly like canonical BPE (single-space separators
    would make adjacent matches share the delimiter and skip every
    other one; regex lookarounds are unavailable in DuckDB's RE2), so
    the DuckDB oracle can unroll the SAME algebra stage by stage with
    plain replace(). Returns (merge_rank, pair, merged, cnt) with
    ties broken by pair string ascending.
    """
    spark = df.sparkSession
    merges = _bpe_train_list(df, body_col, n_merges, top_words)
    return spark.createDataFrame(
        merges, "merge_rank long, pair string, merged string, cnt long"
    )


def _bpe_train_list(
    df: DataFrame, body_col: str, n_merges: int, top_words: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge list for :func:`bpe_train_merges` /
    :func:`bpe_encode_counts` — O(n_merges) rows of driver traffic."""
    base = (
        df.select(F.explode(tokens(F.col(body_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_words)
        # " a  b  c  ": leading single space, two spaces after each symbol
        .select(
            "word",
            "freq",
            F.concat(
                F.lit(" "), F.regexp_replace("word", "(.)", "$1  ")
            ).alias("sym"),
        )
        .persist()
    )
    try:
        sym = F.col("sym")
        merges: list[tuple[int, str, str, int]] = []
        for rank in range(1, n_merges + 1):
            pairs = (
                base.select("freq", sym.alias("s"))
                .select(
                    "freq",
                    F.split(F.trim(F.col("s")), "  ").alias("syms"),
                )
                .filter(F.size("syms") >= 2)
                .select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(syms) - 1), "
                            "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"
                        )
                    ).alias("pair"),
                )
            )
            best = (
                pairs.groupBy("pair")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            pair, cnt = best[0]["pair"], int(best[0]["cnt"])
            x, y = pair.split(" ")
            merged = x + y
            merges.append((rank, pair, merged, cnt))
            sym = F.replace(
                sym, F.lit(f" {x}  {y} "), F.lit(f" {merged} ")
            )
        return merges
    finally:
        base.unpersist()


def bpe_encode_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    n_merges: int = 8,
    top_words: int = 400,
    merges: list[tuple[int, str, str, int]] | None = None,
) -> DataFrame:
    """Apply trained BPE merges to every document — the ENCODE half of
    the tokenizer pair (:func:`bpe_train_merges` is the TRAIN half):
    per document, each word is exploded to its double-space symbol
    form, the n_merges rules are applied in rank order as chained
    literal replaces, and the surviving symbol count is summed.
    Returns (id, n_words, n_char_symbols, n_bpe_tokens) — all BIGINT,
    so the cross-engine hash is exact.

    Scale shape: training is O(n_merges) one-row collects over a
    top_words-bounded table (see bpe_train_merges); the collected
    rules re-enter the plan as LITERALS, so encoding is a pure
    map-only JVM expression over the corpus — no UDF, no shuffle, no
    join; a 100 TB encode is embarrassingly parallel. The same
    double-space invariant as the trainer makes non-overlapping
    left-to-right replace equal canonical BPE application, and lets
    the DuckDB twin (:func:`duckdb_bpe_encode_sql`) unroll the SAME
    replace chain after its training stages.
    """
    # pass `merges` (from _bpe_train_list) to encode with an
    # already-trained tokenizer — a pipeline trains once and encodes
    # many batches, so callers shouldn't pay the training loop per
    # encode (bench chains the merges/encode/fertility family this way)
    if merges is None:
        merges = _bpe_train_list(df, body_col, n_merges, top_words)
    body = F.col(body_col)
    toks = tokens(body)
    # ' a  b  c ' symbol form, then the rank-ordered merge chain
    chain = "concat(' ', regexp_replace(w, '(.)', '$1  '))"
    for _rank, pair, merged, _cnt in merges:
        x, y = pair.split(" ")
        chain = f"replace({chain}, ' {x}  {y} ', ' {merged} ')"
    per_word = f"size(split(trim({chain}), '  '))"
    toks_sql = f"regexp_extract_all(lower({body_col}), '[a-z0-9_]+', 0)"
    n_bpe = F.expr(
        f"aggregate(transform({toks_sql}, w -> {per_word}), "
        "CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT))"
    )
    n_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda a, x: a + x.cast("long"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_words"),
        n_chars.alias("n_char_symbols"),
        n_bpe.alias("n_bpe_tokens"),
    )


def duckdb_bpe_encode_sql(
    n_merges: int = 8, top_words: int = 400, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`bpe_encode_counts`: reuses the trainer's
    unrolled stages (w, s0, p/b/s per rank — :func:`duckdb_bpe_sql`),
    gathers the learned search/replace literals into a ONE-ROW table,
    and applies the same chained replace per word. The merge literals
    enter the lambda as correlated columns of the cross-joined one-row
    table because DuckDB lambdas cannot contain subqueries."""
    from ..hashing import duckdb_tokens_sql

    # training stages: reuse the trainer SQL up to its final UNION
    train = duckdb_bpe_sql(n_merges=n_merges, top_words=top_words, table=table)
    stages = train[: train.index("\nSELECT merge_rank")]
    toks = duckdb_tokens_sql("text")
    rule_cols = ", ".join(
        f"(SELECT ' ' || split_part(pair, ' ', 1) || '  ' || "
        f"split_part(pair, ' ', 2) || ' ' FROM b{r}) AS s{r}_pat, "
        f"(SELECT ' ' || merged || ' ' FROM b{r}) AS s{r}_rep"
        for r in range(1, n_merges + 1)
    )
    chain = "(' ' || regexp_replace(w, '(.)', '\\1  ', 'g'))"
    for r in range(1, n_merges + 1):
        chain = f"replace({chain}, s{r}_pat, s{r}_rep)"
    return f"""{stages},
rules AS MATERIALIZED (SELECT {rule_cols})
SELECT doc_id AS id,
       len(toks)::BIGINT AS n_words,
       COALESCE(CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS BIGINT), 0) AS n_char_symbols,
       COALESCE(CAST(list_sum(list_transform(toks,
           w -> len(string_split(trim({chain}), '  ')))) AS BIGINT), 0) AS n_bpe_tokens
FROM (SELECT doc_id, {toks} AS toks FROM {table}), rules
"""


def bpe_vocab_sweep(
    df: DataFrame,
    body_col: str = "text",
    ckpts: tuple[int, ...] = (2, 4, 8),
    n_merges: int = 8,
    top_words: int = 400,
    merges: list[tuple[int, str, str, int]] | None = None,
) -> DataFrame:
    """Vocab-size SWEEP for the BPE tokenizer: corpus-level token
    counts, fertility, and char-compression at several merge-count
    checkpoints — the measurement a pipeline runs to pick a vocabulary
    size before committing to a tokenizer. BPE merge rules form a
    rank-ordered chain, so "vocab size v" = the first v merges: ONE
    training pass serves every checkpoint, and all checkpoint encodes
    evaluate in a SINGLE map-only projection over the corpus (shared
    scan, one expression per checkpoint). vocab_size = distinct base
    characters + n_merges.

    Scale shape: training is top_words-bounded (bpe_train_merges); the
    sweep adds one corpus scan with len(ckpts) literal replace-chains,
    two scalar aggregates, and a broadcast of the two 1-row results —
    no extra shuffle per checkpoint. Integer ppm outputs, exact oracle
    via :func:`duckdb_bpe_sweep_sql`.
    """
    if merges is None:
        merges = _bpe_train_list(df, body_col, n_merges, top_words)
    toks_sql = f"regexp_extract_all(lower({body_col}), '[a-z0-9_]+', 0)"

    def bpe_expr(mlist: list[tuple[int, str, str, int]]) -> str:
        chain = "concat(' ', regexp_replace(w, '(.)', '$1  '))"
        for _rank, pair, merged, _cnt in mlist:
            x, y = pair.split(" ")
            chain = f"replace({chain}, ' {x}  {y} ', ' {merged} ')"
        per_word = f"size(split(trim({chain}), '  '))"
        return (
            f"aggregate(transform({toks_sql}, w -> {per_word}), "
            "CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT))"
        )

    per_doc = df.selectExpr(
        f"CAST(size({toks_sql}) AS BIGINT) AS n_words",
        f"aggregate(transform({toks_sql}, t -> length(t)), "
        "CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT)) AS n_chars",
        *[f"{bpe_expr(merges[:m])} AS bpe_{m}" for m in ckpts],
    )
    stats = per_doc.agg(
        F.sum("n_words").cast("long").alias("tw"),
        F.sum("n_chars").cast("long").alias("tc"),
        *[F.sum(f"bpe_{m}").cast("long").alias(f"b{m}") for m in ckpts],
    )
    base = (
        df.selectExpr(
            f"explode(regexp_extract_all(lower({body_col}), '[a-z0-9_]', 0)) AS ch"
        )
        .agg(F.count_distinct("ch").cast("long").alias("n_base"))
    )
    one = stats.crossJoin(F.broadcast(base))
    stack_args = ", ".join(
        f"CAST({m} AS BIGINT), n_base + CAST({m} AS BIGINT), tw, tc, b{m}"
        for m in ckpts
    )
    return (
        one.selectExpr(
            f"stack({len(ckpts)}, {stack_args}) AS "
            "(n_merges, vocab_size, total_words, total_char_symbols, "
            "total_bpe_tokens)"
        )
        .selectExpr(
            "n_merges",
            "vocab_size",
            "total_words",
            "total_char_symbols",
            "total_bpe_tokens",
            "(1000000 * total_bpe_tokens) div total_words AS fertility_ppm",
            "(1000000 * total_bpe_tokens) div total_char_symbols"
            " AS compression_ppm",
        )
        .orderBy("n_merges")
    )


def duckdb_bpe_sweep_sql(
    ckpts: tuple[int, ...] = (2, 4, 8),
    n_merges: int = 8,
    top_words: int = 400,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`bpe_vocab_sweep`: unrolled training stages
    (:func:`duckdb_bpe_sql`), one-row rules table, prefix replace-chains
    per checkpoint, scalar rollups, checkpoint grid."""
    from ..hashing import duckdb_tokens_sql

    train = duckdb_bpe_sql(n_merges=n_merges, top_words=top_words, table=table)
    stages = train[: train.index("\nSELECT merge_rank")]
    toks = duckdb_tokens_sql("text")
    rule_cols = ", ".join(
        f"(SELECT ' ' || split_part(pair, ' ', 1) || '  ' || "
        f"split_part(pair, ' ', 2) || ' ' FROM b{r}) AS s{r}_pat, "
        f"(SELECT ' ' || merged || ' ' FROM b{r}) AS s{r}_rep"
        for r in range(1, n_merges + 1)
    )

    def chain(m: int) -> str:
        c = "(' ' || regexp_replace(w, '(.)', '\\1  ', 'g'))"
        for r in range(1, m + 1):
            c = f"replace({c}, s{r}_pat, s{r}_rep)"
        return c

    bpe_cols = ", ".join(
        f"COALESCE(CAST(list_sum(list_transform(toks, "
        f"w -> len(string_split(trim({chain(m)}), '  ')))) AS BIGINT), 0)"
        f" AS bpe_{m}"
        for m in ckpts
    )
    sum_cols = ", ".join(f"SUM(bpe_{m})::BIGINT AS b{m}" for m in ckpts)
    grid = " UNION ALL ".join(f"SELECT {m}::BIGINT AS n_merges" for m in ckpts)
    tbt_case = " ".join(f"WHEN {m} THEN b{m}" for m in ckpts)
    return f"""{stages},
rules AS MATERIALIZED (SELECT {rule_cols}),
per_doc AS (
  SELECT len(toks)::BIGINT AS n_words,
         COALESCE(CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS BIGINT), 0) AS n_chars,
         {bpe_cols}
  FROM (SELECT {toks} AS toks FROM {table}), rules
),
stats AS (SELECT SUM(n_words)::BIGINT AS tw, SUM(n_chars)::BIGINT AS tc, {sum_cols} FROM per_doc),
base AS (
  SELECT COUNT(DISTINCT ch)::BIGINT AS n_base FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]')) AS ch
    FROM {table})
),
grid AS ({grid}),
sel AS (
  SELECT g.n_merges,
         (base.n_base + g.n_merges)::BIGINT AS vocab_size,
         stats.tw, stats.tc,
         (CASE g.n_merges {tbt_case} END)::BIGINT AS tbt
  FROM grid g CROSS JOIN stats CROSS JOIN base
)
SELECT n_merges, vocab_size,
       tw AS total_words, tc AS total_char_symbols, tbt AS total_bpe_tokens,
       ((1000000 * tbt) // tw)::BIGINT AS fertility_ppm,
       ((1000000 * tbt) // tc)::BIGINT AS compression_ppm
FROM sel ORDER BY n_merges
"""


def duckdb_bpe_sql(
    n_merges: int = 8, top_words: int = 400, table: str = "documents"
) -> str:
    """Stage-unrolled DuckDB twin of :func:`bpe_train_merges`: the
    iterative loop becomes n_merges CTE stages of the SAME pair-count /
    argmax / literal-replace algebra (see the double-space invariant in
    bpe_train_merges)."""
    from ..hashing import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    parts = [
        f"""WITH w AS MATERIALIZED (
  SELECT word, COUNT(*)::BIGINT AS freq
  FROM (SELECT unnest({toks}) AS word FROM {table})
  GROUP BY word ORDER BY freq DESC, word LIMIT {top_words}
),
s0 AS MATERIALIZED (
  SELECT word, freq,
         ' ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS sym
  FROM w
)"""
    ]
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        parts.append(
            f""",
p{r} AS MATERIALIZED (
  SELECT pair, SUM(freq)::BIGINT AS cnt FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(syms)),
                  i -> syms[i] || ' ' || syms[i + 1])) AS pair
    FROM (SELECT freq, string_split(trim(sym), '  ') AS syms FROM {prev})
    WHERE len(syms) >= 2
  ) GROUP BY pair
),
b{r} AS MATERIALIZED (
  SELECT {r}::BIGINT AS merge_rank, pair,
         replace(pair, ' ', '') AS merged, cnt
  FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
),
s{r} AS MATERIALIZED (
  SELECT word, freq,
         replace(sym,
                 ' ' || split_part((SELECT pair FROM b{r}), ' ', 1)
                     || '  ' || split_part((SELECT pair FROM b{r}), ' ', 2) || ' ',
                 ' ' || (SELECT merged FROM b{r}) || ' ') AS sym
  FROM {prev}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, pair, merged, cnt FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    parts.append(f"\n{union}\nORDER BY merge_rank")
    return "".join(parts)


def mixture_weights(
    df: DataFrame,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-mixture rebalancing (the Pile / DoReMi-style first pass):
    cap every over-represented source at the corpus's mean per-source
    size by deterministic hash-sampling, keep small sources whole.

    target    = floor(total_docs / n_sources)   (scalar, from one agg)
    w_ppm(s)  = min(1e6, target*1e6 DIV n_s)     per source
    keep(doc) = sample_key(source, id) % 1e6 < w_ppm(source)

    Returns per-source (source, n_docs, weight_ppm, n_sampled) —
    all BIGINT, cross-engine exact (integer DIV, polynomial hash).

    Plan shape: one partial-aggregated count by source (vocabulary- not
    corpus-sized shuffle), the scalar target folded via a window-free
    cross join of the ONE-ROW totals aggregate (broadcast), then the
    keep-test is evaluated map-side per doc and re-aggregated by
    source. At 100 TB the corpus is scanned twice; materializing
    (source, skey) once would trade a cache for the second scan. The
    ACCEPTANCE itself needs no second pass in production — w_ppm is a
    tiny broadcast table and keep() is a map-only filter, exactly like
    stratified_sample."""
    counts = df.groupBy(F.col(stratum_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = counts.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_src")
    )
    weights = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            F.least(
                F.lit(1_000_000).cast("long"),
                F.expr("((total DIV n_src) * 1000000) DIV n_docs"),
            ).alias("weight_ppm"),
        )
    )
    keyed = df.select(
        F.col(stratum_col).alias("source"),
        (sample_key(F.col(stratum_col), F.col(id_col)) % 1_000_000).alias(
            "skey"
        ),
    )
    sampled = (
        keyed.join(F.broadcast(weights), "source")
        .filter(F.col("skey") < F.col("weight_ppm"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        weights.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            "weight_ppm",
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("long").alias(
                "n_sampled"
            ),
        )
        .orderBy("source")
    )


def postings(
    df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    max_postings: int = 16,
    min_df: int = 2,
) -> DataFrame:
    """Inverted index: (term, df, postings) — true document frequency
    plus the ``max_postings`` SMALLEST doc ids containing the term (the
    capped posting list a retrieval layer seeds from).

    The bottom-k posting list is TWO-STAGE so no per-term state is ever
    unbounded: stage 1 takes each shuffle partition's local bottom-k
    per term (collect_set bounded by the partition), stage 2 merges the
    <= k-per-partition candidates — a per-term input bounded by
    k * num_partitions, NOT by the term's true df. A single
    collect_set/window per term would buffer a boilerplate term's every
    doc id (1e9 rows at 100 TB); this caps it structurally. The true
    df rides a separate count_distinct aggregate (partial-aggregated,
    sketch-sized shuffle).
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(body_col))).alias("term")
    ).distinct()
    dfreq = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    local = (
        tok.withColumn("_p", F.spark_partition_id())
        .groupBy("term", "_p")
        .agg(F.slice(F.array_sort(F.collect_set("id")), 1, max_postings).alias("loc"))
    )
    merged = (
        local.select("term", F.explode("loc").alias("id"))
        .groupBy("term")
        .agg(
            F.slice(F.array_sort(F.collect_set("id")), 1, max_postings).alias(
                "postings"
            )
        )
    )
    return (
        dfreq.filter(F.col("df") >= min_df)
        .join(merged, "term")
        .select("term", "df", "postings")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    body_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """BM25-int top-k document retrieval: Okapi BM25 (k1=1.2, b=0.75)
    with every step integerized so the ranking is an exact integer
    function of the corpus — bit-identical cross-engine (repo float
    convention; cross-engine ln()/pow() differ in ulps).

    The integerization, all floor divisions (`div`):
    - avgdl_m  = 1000*T div N          (avg doc length, milli)
    - ratio_m  = 1000000*dl div avgdl_m            (dl/avgdl, milli)
    - denom_m  = 1000*tf + k1_m*(250 + b_m*ratio_m div 1000) div 1000
      with k1_m=1200, b_m=750, 250 = 1000*(1-b)   (BM25 denominator)
    - tf_q16   = 65536*2200*tf div denom_m   (2200 = 1000*(k1+1))
    - idf: the scaled odds R = (2*(N-df)+1)*2^20 div (2*df+1)
      (clamped >=1), then a PIECEWISE-LINEAR log2 — msb = bitlength-1
      via conv(r,10,2), fractional part linear in q10 — instead of
      float ln: idf_q10 = max((msb-20)*1024 + (R-2^msb)*1024 div
      2^msb, 0). Monotone in the true idf, within 0.086 of log2,
      clamped non-negative like Lucene's idf.
    - score_q26 = sum over matched terms of tf_q16 * idf_q10.

    Scale shape: the query-term set broadcasts as an isin filter BEFORE
    any shuffle, so the (doc, term) aggregation carries only matching
    postings; df-per-term and the (N, T) scalars are tiny broadcast
    sides; top-k is one TakeOrdered (per-partition heaps, no global
    sort). The corpus-sized token scan runs TWICE (the dl branch and
    the filtered postings branch — Catalyst has no exchange to reuse
    between them); a production deployment amortizes both behind the
    standing (term, doc, tf) + (id, dl) index tables that
    :func:`postings` builds, making each query index-sized. Overflow-
    safe to N ~ 1e11 docs (R < 2^42 * 2^20).

    Output: (id, score_q26, n_terms), ties broken by id asc.
    """
    qt = sorted({t.lower() for t in query_terms})
    scored = _bm25_term_scores(df, id_col, body_col, lambda tok: tok.filter(F.col("term").isin(qt)))
    return (
        scored.groupBy("id")
        .agg(
            F.sum(F.expr("tf_q16 * idf_q10")).cast("long").alias("score_q26"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .orderBy(F.desc("score_q26"), F.asc("id"))
        .limit(k)
    )


def _bm25_term_scores(df: DataFrame, id_col: str, body_col: str, term_filter):
    """Shared BM25-int scoring chain: (id, term, tf_q16, idf_q10) for
    every (doc, matched-term) pair. ``term_filter`` narrows the token
    stream to query terms BEFORE any shuffle — an isin literal for a
    fixed query, a broadcast semi-join for a query table."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(body_col))).alias("term")
    )
    dl = tok.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    scal = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("t_tokens")
    ).selectExpr("n_docs", "(1000 * t_tokens) div n_docs AS avgdl_m")
    hits = term_filter(tok)
    tf = hits.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = hits.groupBy("term").agg(F.count_distinct("id").alias("dfq"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(scal))
        .selectExpr(
            "id",
            "term",
            "tf",
            "dfq",
            "n_docs",
            "(1000000 * dl) div avgdl_m AS ratio_m",
        )
        .selectExpr(
            "id",
            "term",
            "1000 * tf + (1200 * (250 + (750 * ratio_m) div 1000)) div 1000 AS denom_m",
            "tf",
            "greatest(((2 * (n_docs - dfq) + 1) * 1048576) div (2 * dfq + 1), 1L) AS r",
        )
        .selectExpr(
            "id",
            "term",
            "(65536 * 2200 * tf) div denom_m AS tf_q16",
            "length(conv(r, 10, 2)) - 1 AS msb",
            "r",
        )
        .selectExpr(
            "id",
            "term",
            "tf_q16",
            "greatest((msb - 20) * 1024 "
            "+ ((r - shiftleft(1L, msb)) * 1024) div shiftleft(1L, msb), 0L) AS idf_q10",
        )
    )


def bm25_topk_batch(
    df: DataFrame,
    queries_df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Multi-query BM25 serving: score a TABLE of queries
    (qid, term) in one plan and return each query's top-k documents —
    the batch-retrieval shape (eval-suite lookup, hard-negative
    mining) where per-query jobs would be absurd at scale.

    Same BM25-int quantization as :func:`bm25_topk`; a term shared by
    two queries is scored once (df over the DISTINCT term set) and
    fanned out by a broadcast join on the query table. Top-k per query
    is a window PARTITIONED by qid — bounded by that query's candidate
    set, never global.

    Output: (qid, id, score_q26, n_terms, rank), rank 1..k per qid.
    """
    qt = queries_df.select("qid", F.lower(F.col("term")).alias("term")).distinct()
    terms = qt.select("term").distinct()
    scored = _bm25_term_scores(
        df, id_col, body_col,
        lambda tok: tok.join(F.broadcast(terms), "term", "left_semi"),
    )
    per_query = (
        scored.join(F.broadcast(qt), "term")
        .groupBy("qid", "id")
        .agg(
            F.sum(F.expr("tf_q16 * idf_q10")).cast("long").alias("score_q26"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_q26"), F.asc("id"))
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score_q26", "n_terms", "rank")
    )


def weighted_bottomk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: integerized
    Efraimidis-Spirakis bottom-k. Each row's priority key is
    mixed_hash(id) DIV max(weight, 1); the k smallest keys win, so a
    row with twice the weight halves its expected key — inclusion
    odds scale with weight — while membership stays an exact integer
    function of the data (no rand(), reproducible on any cluster
    size, oracle-checkable). The float-exponent original (u^(1/w))
    is deliberately avoided: cross-engine pow() differs in ulps.

    Scale shape: the key is map-only; bottom-k overall is one
    TakeOrdered (per-partition heaps, no global sort). With
    ``stratum_col`` the ranking windows per stratum instead — k rows
    PER stratum, one partitioned window, no global stage.
    Output (id, weight, skey [, stratum]).
    """
    mixed = (
        token_hash(F.col(id_col).cast("string")) * F.lit(2654435761)
    ) % F.lit(1_000_000_007)
    base = df.select(
        *([F.col(stratum_col).alias("stratum")] if stratum_col else []),
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("long").alias("weight"),
        mixed.alias("_h"),
    ).selectExpr(
        *(["stratum"] if stratum_col else []),
        "id",
        "weight",
        "_h DIV greatest(weight, 1L) AS skey",
    )
    if stratum_col:
        w = Window.partitionBy("stratum").orderBy("skey", "id")
        return (
            base.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("stratum", "id", "weight", "skey")
        )
    return base.orderBy(F.asc("skey"), F.asc("id")).limit(k)


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023) — hashed-bigram feature
# weights; integer-exact ppm surrogate of the log-likelihood ratio
# ---------------------------------------------------------------------------


def dsir_features(
    df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document hashed-bigram feature counts: (id, source, bucket,
    c). The DSIR feature extractor — map-only explode + one
    (id, bucket)-keyed partial-agg shuffle. The bigram hash is the
    repo's two-token 131-fold (dedup.shingles spec at n=2), so the
    DuckDB twin reproduces it exactly."""
    from ..model import HASH_MOD

    hl = F.transform(tokens(F.col(body_col)), token_hash)
    bih = F.zip_with(
        hl,
        F.slice(hl, 2, F.greatest(F.size(hl) - 1, F.lit(0))),
        lambda a, b: (a * F.lit(131) + b) % F.lit(HASH_MOD),
    )
    return (
        df.select(
            F.col(id_col).alias("id"), "source", F.explode(bih).alias("bh")
        )
        # zip_with pads the short side with NULL: no successor, no bigram
        .filter(F.col("bh").isNotNull())
        .select("id", "source", (F.col("bh") % F.lit(n_buckets)).alias("bucket"))
        .groupBy("id", "source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def dsir_bucket_weights(
    feat: DataFrame, target_source: str, n_buckets: int = 1024
) -> DataFrame:
    """Train the DSIR bucket weight table from a feature frame:
    (bucket, w) with w = (1e6*T_f) div T_tot - (1e6*R_f) div R_tot,
    Laplace +1 smoothed over a dense bucket grid. All-positive
    operands make Spark's truncating `div` equal DuckDB's flooring
    `//`. The output is n_buckets rows — broadcast it."""
    spark = feat.sparkSession
    is_tgt = F.col("source") == target_source
    tstats = (
        feat.filter(is_tgt).groupBy("bucket").agg(F.sum("c").cast("long").alias("tf"))
    )
    rstats = (
        feat.filter(~is_tgt).groupBy("bucket").agg(F.sum("c").cast("long").alias("rf"))
    )
    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    bt = (
        grid.join(tstats, "bucket", "left")
        .join(rstats, "bucket", "left")
        .select(
            "bucket",
            (F.coalesce(F.col("tf"), F.lit(0)) + F.lit(1)).cast("long").alias("tf"),
            (F.coalesce(F.col("rf"), F.lit(0)) + F.lit(1)).cast("long").alias("rf"),
        )
    )
    totals = bt.agg(
        F.sum("tf").cast("long").alias("ttot"),
        F.sum("rf").cast("long").alias("rtot"),
    )
    return bt.crossJoin(F.broadcast(totals)).selectExpr(
        "bucket",
        "(1000000 * tf) div ttot - (1000000 * rf) div rtot AS w",
    )


def dsir_score(feat: DataFrame, weights: DataFrame) -> DataFrame:
    """Score documents against a trained weight table: (id, source,
    n_bigrams, dsir_score). Map-side broadcast join + one per-doc
    rollup — a new batch scores without touching the training corpus,
    which is what makes the operator stream-native
    (streaming.ingest.stream_dsir_score)."""
    return (
        feat.join(F.broadcast(weights), "bucket")
        .groupBy("id", "source")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("w")).cast("long").alias("dsir_score"),
        )
    )


# ---------------------------------------------------------------------------
# stupid-backoff bigram LM scoring (Brants et al. 2007) — the CCNet-style
# domain/perplexity filter, integerized so both engines agree bit-for-bit
# ---------------------------------------------------------------------------

#: round(log2(0.4) * 1024) — the stupid-backoff penalty in q10
LM_BACKOFF_Q10 = -1354


def _plog2_cols(ratio_col: str) -> str:
    """SQL fragment: piecewise-linear log2 of an ALREADY >=1 BIGINT
    ratio in q20 fixed point, result in q10 (the BM25-idf
    construction: msb via bit length, linear fraction). Every division
    has non-negative operands, so Spark `div` == DuckDB `//`."""
    msb = f"(length(bin({ratio_col})) - 1)"
    return (
        f"(({msb} - 20) * 1024 + (({ratio_col} - shiftleft(1L, cast({msb} AS int)))"
        f" * 1024) div shiftleft(1L, cast({msb} AS int)))"
    )


def lm_stupid_backoff_rollup(
    docs: DataFrame,
    train_sources: tuple[str, ...],
    id_col: str = "doc_id",
    body_col: str = "text",
) -> DataFrame:
    """Score EVERY document under a bigram stupid-backoff LM trained on
    a source subset, rolled up per source — the domain-affinity /
    perplexity quality filter (CCNet uses a KenLM; the integerized
    bigram LM is the cross-engine-exact stand-in, same decision shape).

    Per bigram instance (w1, w2), log-prob in q10 fixed point:
    - seen bigram:   plog2(c12 * 2^20 div c1(w1))
    - unigram hit:   log2(0.4)_q10 + plog2(c1(w2) * 2^20 div N)
    - full OOV:      log2(0.4)_q10 + plog2(2^20 div N)   (pseudo-count 1)
    ratios clamp at 1 (large-N guard). avg_lp_q10 uses FLOORED division
    (sums are negative — Spark `div` truncates, the helper floors).

    Scale shape: the LM tables (c12, c1) are vocab-sized — Spark
    broadcasts them under the fact-sized token stream; N is a 1-row
    broadcast. Scoring is map-side joins + one source-keyed rollup; the
    corpus streams once. Train sources with the highest (least
    negative) avg score ARE the in-domain signal.
    """
    from ..functions.text import tokens

    toks = tokens(F.col(body_col))
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    db = (
        docs.select(
            F.col(id_col).alias("id"), "source", F.explode(pairs).alias("bg")
        )
        .select("id", "source", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    train_tok = docs.filter(F.col("source").isin(list(train_sources))).select(
        F.explode(toks).alias("w")
    )
    tr1 = train_tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    tr12 = db.filter(F.col("source").isin(list(train_sources))).groupBy(
        "w1", "w2"
    ).agg(F.count(F.lit(1)).cast("long").alias("c12"))
    nn = tr1.agg(F.sum("c1").cast("long").alias("n_train"))
    sc = (
        db.join(tr12, ["w1", "w2"], "left")
        .join(tr1.selectExpr("w AS w1", "c1 AS c1w1"), "w1", "left")
        .join(tr1.selectExpr("w AS w2", "c1 AS c1w2"), "w2", "left")
        .crossJoin(F.broadcast(nn))
        .selectExpr(
            "id",
            "source",
            "CASE WHEN c12 IS NOT NULL THEN greatest((c12 * 1048576) div c1w1, 1L)"
            " WHEN c1w2 IS NOT NULL THEN greatest((c1w2 * 1048576) div n_train, 1L)"
            " ELSE greatest(1048576 div n_train, 1L) END AS ratio",
            "CASE WHEN c12 IS NOT NULL THEN 0L ELSE 1L END AS backoff",
        )
        .selectExpr(
            "id",
            "source",
            "backoff",
            f"{_plog2_cols('ratio')} + backoff * {LM_BACKOFF_Q10}L AS lp_q10",
        )
    )
    return (
        sc.groupBy("source")
        .agg(
            F.count_distinct("id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("backoff").cast("long").alias("n_backoff"),
            F.sum("lp_q10").cast("long").alias("sum_lp_q10"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_bigrams",
            "(1000000 * n_backoff) div n_bigrams AS backoff_ppm",
            "sum_lp_q10",
            # TRUNCATING division on purpose: DuckDB's integer `//`
            # truncates toward zero exactly like Spark's `div` (both
            # verified on negative sums), so the twins agree with no
            # correction term; only float `//` / Python `//` floor
            "cast(sum_lp_q10 div n_bigrams AS bigint) AS avg_lp_q10",
        )
        .orderBy("source")
    )
