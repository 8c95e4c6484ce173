"""Text-analysis operators for training-data pipelines (SURVEY §2.11).

Language-ID (marker-token heuristic), quality scoring, token counting,
and document fingerprinting — all pure Spark SQL expressions (no
Python in the hot path) so they codegen and push down, and all
reproducible in DuckDB SQL for the correctness oracle.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve in module globals
from pyspark.sql import Column, DataFrame, functions as F

from ..functions import text as Ft
from . import dedup as D

#: deterministic marker-token lists per language (heuristic, not a model)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "los", "de", "que", "y"),
    "fr": ("le", "la", "les", "et", "est", "que"),
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def token_counts(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """Token counting two ways (whitespace split vs BPE-ish regex) plus
    char length: (id, n_chars, n_ws_tokens, n_re_tokens)."""
    body = F.col(body_col)
    # ASCII \s on both count paths — the DuckDB oracle twin is RE2
    ws = F.split(Ft.normalize_ws(body), " ")
    return df.select(
        F.col(id_col).alias("id"),
        F.length(body).cast("long").alias("n_chars"),
        F.when(Ft.is_blank_ascii(body), F.lit(0))
        .otherwise(F.size(ws))
        .cast("long")
        .alias("n_ws_tokens"),
        F.size(Ft.tokens(body)).cast("long").alias("n_re_tokens"),
    )


def quality_features(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """Quality-score features: punctuation/digit/stopword ratios and
    mean token length, plus a deterministic composite score in [0,1].

    The composite is a fixed linear blend — a placeholder for a learned
    quality model, but the *plumbing* (pure-expression feature
    extraction at scan time) is the real deliverable.
    """
    body = F.col(body_col)
    toks = Ft.tokens(body)
    n_tok = F.size(toks)
    n_chars = F.length(body)
    punct = F.length(F.regexp_replace(body, r"[^.,;:!?'\"]", ""))
    digits = F.length(F.regexp_replace(body, r"[^0-9]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda a, x: a + x.cast("long"),
    )
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(  # noqa: E731
        F.lit(0.0)
    )
    out = df.select(
        F.col(id_col).alias("id"),
        F.round(safe(punct, n_chars), 6).alias("punct_ratio"),
        F.round(safe(digits, n_chars), 6).alias("digit_ratio"),
        F.round(safe(n_stop, n_tok), 6).alias("stopword_ratio"),
        F.round(safe(tok_chars, n_tok), 6).alias("mean_tok_len"),
        n_tok.cast("long").alias("n_tokens"),
    )
    score = (
        F.lit(0.25) * F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 10, F.lit(1.0)))
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.col("digit_ratio") * 10, F.lit(1.0)))
        + F.lit(0.25)
        * F.least(F.greatest(F.col("mean_tok_len") - 2, F.lit(0.0)) / 4, F.lit(1.0))
    )
    return out.withColumn("quality", F.round(score, 6))


def quality_features_exact(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """Integer-exact quality features for cross-engine verification.

    Ratios as floored parts-per-million and the composite as an integer
    in [0, 16e6] (conceptually quality = q16/16e6). Floored integer
    ppm is deterministic across engines: the true ratio is a rational
    with denominator <= len(body), so it is never within double error
    of an integer boundary unless it IS that integer (in which case the
    double division is exact). Decimal *rounding* of the blended
    double, by contrast, lands exactly on .5 boundaries where Spark
    and DuckDB legitimately disagree — hence this variant.
    """
    body = F.col(body_col)
    toks = Ft.tokens(body)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(body).cast("long")
    punct = F.length(F.regexp_replace(body, r"[^.,;:!?'\"]", "")).cast("long")
    digits = F.length(F.regexp_replace(body, r"[^0-9]", "")).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("long")
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda a, x: a + x.cast("long"),
    )
    ppm = lambda num, den: F.when(  # noqa: E731
        den > 0, F.floor(num * F.lit(1000000) / den).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    out = df.select(
        F.col(id_col).alias("id"),
        ppm(punct, n_chars).alias("punct_ppm"),
        ppm(digits, n_chars).alias("digit_ppm"),
        ppm(n_stop, n_tok).alias("stop_ppm"),
        ppm(tok_chars, n_tok).alias("mtl_ppm"),
        n_tok.alias("n_tokens"),
    )
    m = F.lit(1000000).cast("long")
    s1 = F.least(F.col("stop_ppm") * 4, m)
    s2 = m - F.least(F.col("punct_ppm") * 10, m)
    s3 = m - F.least(F.col("digit_ppm") * 10, m)
    s4 = F.least(F.greatest(F.col("mtl_ppm") - 2 * m, F.lit(0).cast("long")), 4 * m)
    return out.withColumn("quality_q16", (s1 * 4 + s2 * 4 + s3 * 4 + s4).cast("long"))


def lang_id(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """Marker-token language heuristic: argmax of per-language marker
    hits (ties broken by language code ascending); no hits -> 'und'.

    Output (id, lang_pred, hits). N-gram-free by design so the DuckDB
    oracle is a literal transliteration.
    """
    toks = Ft.tokens(F.col(body_col))
    # argmax via array_max over (hits, nrank, lang) structs: struct compare
    # is lexicographic, and nrank = -index-in-sorted-order makes ties on
    # hits resolve to the alphabetically FIRST language code.
    ranked = []
    for i, (lang, markers) in enumerate(sorted(LANG_MARKERS.items())):
        arr = F.array(*[F.lit(m) for m in markers])
        ranked.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(
                    "hits"
                ),
                F.lit(-i).alias("nrank"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*ranked))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
        best["hits"].cast("long").alias("hits"),
    )


def fingerprints(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """Document fingerprint: the WIDE (~60-bit, two independent folds)
    content hash of the normalized text (id, fp). Same spec as the
    exact-dedup key (Arrow UDF path; hashing.fingerprint_wide) — the
    single ~2^30 fold mass-collides at corpus scale."""
    return df.select(
        F.col(id_col).alias("id"),
        D.fingerprint_wide_udf()(F.col(body_col)).alias("fp"),
    )


#: PII patterns — deliberately conservative subset that parses
#: identically under Java regex (Spark) and RE2 (DuckDB): no
#: backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def scrub_pii(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """PII scrubbing pass: redact email addresses and phone numbers,
    report per-document match counts — the compliance step every
    training-data pipeline runs before anything else sees the text.

    Pure JVM (regexp_replace / regexp_extract_all), map-only; the
    patterns avoid constructs where Java regex and RE2 diverge, so the
    DuckDB oracle reproduces the scrub byte-for-byte. Emails redact
    first so a phone-looking fragment inside an email can't double-
    count. Returns (id, n_emails, n_phones, scrubbed).
    """
    body = F.col(body_col)
    n_emails = F.size(F.regexp_extract_all(body, F.lit(EMAIL_RE), 0)).cast("long")
    no_email = F.regexp_replace(body, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(
        F.regexp_extract_all(no_email, F.lit(PHONE_RE), 0)
    ).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.regexp_replace(no_email, PHONE_RE, "<PHONE>").alias("scrubbed"),
    )


def _rep_counts_udf(n: int):
    """Arrow UDF: body -> (n_grams, n_distinct) over HASHED token
    n-grams (the repo shingle spec: fold with 131 mod HASH_MOD).
    Hashing instead of materializing gram strings follows the
    dedup.shingles convention — the expression form re-folds every
    character of every token and measured ~20x slower at sf0.1."""
    import pandas as pd

    from ..hashing import HASH_MOD, token_hash, tokenize

    @F.pandas_udf("array<long>")
    def _rep(bodies: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def counts(b):
            toks = tokenize(b or "")
            if len(toks) < n:
                return [0, 0]
            hl = []
            for t in toks:
                h = cache.get(t)
                if h is None:
                    h = token_hash(t)
                    cache[t] = h
                hl.append(h)
            seen = set()
            total = len(hl) - n + 1
            for i in range(total):
                acc = 0
                for h in hl[i : i + n]:
                    acc = (acc * 131 + h) % HASH_MOD
                seen.add(acc)
            return [total, len(seen)]

        return bodies.map(counts)

    return _rep


def repetition_stats(
    df: DataFrame, id_col: str, body_col: str, n: int = 3
) -> DataFrame:
    """Intra-document repetition score: 1 - distinct/total HASHED token
    n-grams, as floored integer ppm (cross-engine exact, same
    convention as quality_features_exact). High repetition flags
    boilerplate/spam/looping text — a standard pretraining quality
    gate. N-grams are compared by their shingle hash (dedup spec),
    so the DuckDB oracle reproduces the counts exactly — including
    any hash collision, which lands identically in both engines.
    Map-only Arrow pass, no shuffle."""
    counts = _rep_counts_udf(n)(F.col(body_col))
    total = F.col("_rc")[0]
    distinct = F.col("_rc")[1]
    rep_ppm = F.when(
        total > 0,
        F.floor((total - distinct) * F.lit(1000000) / total).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col).alias("id"), counts.alias("_rc")).select(
        "id",
        total.alias("n_grams"),
        distinct.alias("n_distinct"),
        rep_ppm.alias("rep_ppm"),
    )


def gopher_rules(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """Gopher-style document quality RULES (Rae et al. 2021 §A1.1,
    adapted to the corpus token model): per-document boolean gates a
    pretraining pipeline filters on, alongside the integer features
    that drive them. All thresholds are the published ones where the
    rule translates (word count >= 50, mean word length in [3, 10],
    >= 2 stopword hits, >= 80% alphabetic words, symbol ratio <=
    10%); features are floored integer ppm so every value is
    cross-engine exact (see quality_features_exact for why floored
    ppm is deterministic where decimal rounding is not).

    Distinct from quality_features_exact: that operator produces a
    blended SCORE for ranking; this one produces the hard PASS/FAIL
    gates (the standard first stage of a corpus funnel). Pure
    map-only JVM expressions — codegen-eligible, no shuffle, filter
    pushes to the scan.
    """
    body = F.col(body_col)
    toks = Ft.tokens(body)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(body).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("long")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ).cast("long")
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda a, x: a + x.cast("long"),
    )
    # non-token symbol mass: chars outside [a-z0-9_ ] (lowercased view)
    n_sym = F.length(
        F.regexp_replace(F.lower(body), "[a-z0-9_ ]", "")
    ).cast("long")
    ppm = lambda num, den: F.when(  # noqa: E731
        den > 0, F.floor(num * F.lit(1000000) / den).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    out = df.select(
        F.col(id_col).alias("id"),
        n_tok.alias("n_tokens"),
        ppm(tok_chars, n_tok).alias("mtl_ppm"),
        n_stop.alias("stop_hits"),
        ppm(n_alpha, n_tok).alias("alpha_ppm"),
        ppm(n_sym, n_chars).alias("sym_ppm"),
    )
    p_wc = (F.col("n_tokens") >= 50) & (F.col("n_tokens") <= 100000)
    p_mtl = (F.col("mtl_ppm") >= 3000000) & (F.col("mtl_ppm") <= 10000000)
    p_stop = F.col("stop_hits") >= 2
    p_alpha = F.col("alpha_ppm") >= 800000
    p_sym = F.col("sym_ppm") <= 100000
    return (
        out.withColumn("pass_word_count", p_wc)
        .withColumn("pass_mean_len", p_mtl)
        .withColumn("pass_stop", p_stop)
        .withColumn("pass_alpha", p_alpha)
        .withColumn("pass_symbol", p_sym)
        .withColumn(
            "gopher_pass", p_wc & p_mtl & p_stop & p_alpha & p_sym
        )
    )


def lm_coverage(
    df: DataFrame,
    id_col: str,
    body_col: str,
    top_bigrams: int = 1000,
) -> DataFrame:
    """CCNet-style language-model quality proxy, integer-exact: score
    each document by how much of it a reference bigram table explains.

    A real CCNet filter buckets documents by KenLM perplexity; the
    cross-engine-exact stand-in is bigram COVERAGE against the
    corpus's own top-N bigram table (count desc, bigram asc — the
    deterministic tie rule): cov_ppm = floor(1e6 * occurrences of
    in-table bigrams / total bigrams). Log-prob itself is
    deliberately avoided — float log sums diverge across engines;
    coverage ranks boilerplate vs gibberish the same way at the
    filter threshold.

    Plan: the bigram table is vocabulary-bounded (one partial-agg
    shuffle + top-N) and BROADCASTS to the per-doc join; per-doc
    totals are a map-only array expression; the known-count is one
    broadcast-hash join + per-doc partial count. Nothing corpus-sized
    shuffles except the doc-keyed count itself.
    Output (id, n_bigrams, n_known, cov_ppm).
    """
    body = F.col(body_col)
    toks = Ft.tokens(body)
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    real_pairs = F.filter(pairs, lambda b: b.contains(" "))
    lm = (
        df.select(F.explode(pairs).alias("bigram"))
        .filter(F.col("bigram").contains(" "))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(top_bigrams)
        .select("bigram")
    )
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(pairs).alias("bigram")
    ).filter(F.col("bigram").contains(" "))
    known = (
        exploded.join(F.broadcast(lm), "bigram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_known"))
    )
    totals = df.select(
        F.col(id_col).alias("id"),
        F.size(real_pairs).cast("long").alias("n_bigrams"),
    )
    return totals.join(known, "id", "left").select(
        "id",
        "n_bigrams",
        F.coalesce(F.col("n_known"), F.lit(0)).cast("long").alias("n_known"),
        F.when(
            F.col("n_bigrams") > 0,
            F.floor(
                F.coalesce(F.col("n_known"), F.lit(0))
                * F.lit(1000000)
                / F.col("n_bigrams")
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("cov_ppm"),
    )


# ---------------------------------------------------------------------------
# HTML boilerplate extraction (the web-corpus cleaning stage)
# ---------------------------------------------------------------------------

#: container tags whose CONTENT is boilerplate (dropped whole).
#: One regex pass per tag: RE2 (the oracle engine) has no
#: backreferences, so a single '<(a|b)>.*?</\\1>' pattern is not
#: portable — per-tag lazy patterns are.
HTML_DROP_TAGS = ("script", "style", "nav", "footer")


def html_extract(c: Column) -> Column:
    """Extract visible text from HTML: drop script/style/nav/footer
    blocks (content and all), strip remaining tags to spaces, unescape
    the core entities, collapse whitespace. Pure JVM regex chain —
    byte-exact DuckDB twin in queries_ext (Java (?s)+lazy and RE2
    agree on every pattern used; backreferences deliberately avoided).
    The web-corpus boilerplate-removal stage, CommonCrawl-shaped."""
    out = c
    for tag in HTML_DROP_TAGS:
        # name boundary (\s[^>]*)? — bare '<nav[^>]*>' would anchor at
        # a PREFIX-named tag like '<navy>' and lazily delete visible
        # text through the next genuine '</nav>' (review finding)
        out = F.regexp_replace(out, rf"(?s)<{tag}(\s[^>]*)?>.*?</{tag}>", " ")
    out = F.regexp_replace(out, "<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return Ft.normalize_ws(out)


def html_wrap(text: Column, title: Column) -> Column:
    """Deterministic HTML-page fixture: wrap a text in a full page
    with a title/h1 plus script/style/nav/footer boilerplate, entity-
    escaping the body (&, <, > — so raw markup inside the text cannot
    inject tags). html_extract provably inverts this wrapping:
    recovered == title + ' ' + title + ' ' + normalized(text)."""
    esc = text
    for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(ch), F.lit(ent))
    return F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title><style>.x{color:red}</style></head><body><h1>"),
        title,
        F.lit("</h1><nav>home | about</nav><p>"),
        esc,
        F.lit("</p><script>var x=1;</script><footer>(c) 2026</footer></body></html>"),
    )
