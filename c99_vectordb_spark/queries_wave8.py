"""Round-6 session-8 wave: privacy risk auditing (k-anonymity /
l-diversity), rank-correlation panels, character-entropy quality
gating, autocorrelation analysis, edit-distance dedup verification,
off-policy evaluation, and LOF outlier scoring — each with a
hash-exact DuckDB oracle twin.

Like the rest of the §2.11 tier these go beyond the reference's
surface (reference: memo_cli.py implements recall/filter/analyze
only) toward what a large-scale training-data pipeline needs; the
cross-engine exactness contract follows the repo conventions:
truncating integer division on positive operands via ``div`` / ``//``
(floored via functions.text.floor_div_sql where operands can go
negative), doubles only through order-pinned left folds or
algebraically closed expressions over exact integer sums,
``round(x, 4)`` before any float enters the output, and every ranking
tie-broken by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import hashing
from .functions.text import floor_div_sql
from .queries_wave7 import _spark_md5_56

# ---------------------------------------------------------------------------
# anonymize_kanon_report — k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

#: quasi-identifier balance bucket width, in cents (500.00 currency units)
_KANON_BUCKET_CENTS = 50_000
#: re-identification threshold: classes smaller than this are "at risk"
_KANON_K = 5


def q_anonymize_kanon_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    et al. 2007) of the customer table under the quasi-identifier set
    (nation, account-balance bucket) with market segment as the
    sensitive attribute — the privacy-risk report a training-data
    release pipeline runs BEFORE anonymize_orders-style generalization
    decides how much to coarsen. Per nation: equivalence-class count,
    k (the minimum class size — rows in classes below k=5 are
    re-identifiable), and l (the minimum sensitive-value diversity —
    classes with l=1 leak the segment outright even at high k).

    Everything is integer counting, so the oracle is exact with no
    float contract. Balance buckets use FLOORED division (balances go
    negative; Spark ``div`` truncates — floor_div_sql on both sides).

    Scale shape: two partial-aggregated shuffles (rows -> classes ->
    nations), both keyed on the quasi-identifier prefix; class and
    nation tables are rollup-sized. 100 TB story: the QID groupBy is
    the same plan as any fact-table rollup — no per-row state, no
    collect."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cls = (
        cust.selectExpr(
            "c_nationkey",
            floor_div_sql(
                "cast(round(c_acctbal * 100) AS bigint)", _KANON_BUCKET_CENTS
            )
            + " AS bal_bucket",
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.countDistinct("c_mktsegment").cast("long").alias("l"),
        )
    )
    return (
        cls.groupBy("c_nationkey")
        .agg(
            F.sum("k").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("k").cast("long").alias("k_min"),
            F.sum(F.when(F.col("k") < _KANON_K, F.col("k")).otherwise(F.lit(0)))
            .cast("long")
            .alias("rows_below_k"),
            F.min("l").cast("long").alias("l_min"),
            F.sum(F.when(F.col("l") == 1, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("classes_l1"),
        )
        .orderBy("c_nationkey")
    )


def _oracle_anonymize_kanon_report() -> str:
    bucket = hashing.duckdb_floor_div_sql(
        "ROUND(c_acctbal * 100)::BIGINT", _KANON_BUCKET_CENTS
    )
    return f"""
WITH ka_q AS (
  SELECT c_nationkey, {bucket} AS bal_bucket, c_mktsegment FROM customer
),
ka_cls AS (
  SELECT c_nationkey, bal_bucket, COUNT(*)::BIGINT AS k,
         COUNT(DISTINCT c_mktsegment)::BIGINT AS l
  FROM ka_q GROUP BY 1, 2
)
SELECT c_nationkey,
       SUM(k)::BIGINT AS n_rows,
       COUNT(*)::BIGINT AS n_classes,
       MIN(k)::BIGINT AS k_min,
       SUM(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END)::BIGINT AS rows_below_k,
       MIN(l)::BIGINT AS l_min,
       SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END)::BIGINT AS classes_l1
FROM ka_cls GROUP BY 1 ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# stats_spearman — Spearman vs Pearson correlation panel, exact ranks
# ---------------------------------------------------------------------------


def q_stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-correlation panel per lineitem return flag: Spearman's rho
    (Pearson on tie-averaged ranks — the monotone-association measure
    robust to the price outliers Pearson chases) next to the raw
    Pearson r it robustifies, for quantity vs extended price.

    Exactness: both variables integerize to cents; ranks are EXACT
    with proper tie handling and never float — each tied value's
    DOUBLED average rank is min(rn) + max(rn) (row numbers within a
    tie run are consecutive — the Mann-Whitney construction). All five
    moment sums (Sx, Sy, Sxy, Sxx, Syy) are exact integers
    (DECIMAL(38,0) in Spark, HUGEINT internally in DuckDB); the
    correlations are closed-form expressions over those exact sums,
    evaluated in doubles with identical parenthesization on both
    engines and rounded to 4.

    Scale shape: a partition-by-flag rank window would cap parallelism
    at the flag cardinality (3!), so ranks come from the range-stitch
    global_rank over the total (flag, value, keys) order — flag groups
    are contiguous there, so the within-flag doubled rank is the
    global one minus twice the flag's row offset (a 3-row broadcast
    join). Three flag-keyed aggregations; the join back to rows is on
    (flag, value) against value-sized rank tables. No global window,
    nothing collects but the stitch prefixes."""
    from .operators.scalable_window import global_rank

    # the cents projection feeds five consumers (flag census, two rank
    # sorts, the final double join) — persist it once
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_returnflag AS flag",
            "cast(round(l_quantity * 100) AS bigint) AS xv",
            "cast(round(l_extendedprice * 100) AS bigint) AS yv",
            "l_orderkey",
            "l_linenumber",
        )
        .persist()
    )
    # rows before each flag group in (flag, ...) order: tiny n_flags^2
    # self-join, broadcast everywhere it's consumed
    fc = li.groupBy("flag").agg(F.count(F.lit(1)).cast("long").alias("fn"))
    off = (
        fc.alias("a")
        .join(fc.alias("b"), F.col("b.flag") < F.col("a.flag"), "left")
        .groupBy(F.col("a.flag").alias("flag"))
        .agg(F.coalesce(F.sum("b.fn"), F.lit(0)).cast("long").alias("off"))
    )

    def doubled_ranks(val: str, out: str) -> DataFrame:
        ranked = global_rank(
            li.select("flag", val, "l_orderkey", "l_linenumber"),
            [
                F.asc("flag"),
                F.asc(val),
                F.asc("l_orderkey"),
                F.asc("l_linenumber"),
            ],
            "rn",
        )
        g2 = ranked.groupBy("flag", val).agg(
            (F.min("rn") + F.max("rn")).cast("long").alias("g2")
        )
        return g2.join(F.broadcast(off), "flag").selectExpr(
            "flag", val, f"g2 - 2L * off AS {out}"
        )

    ranked = li.join(doubled_ranks("xv", "r2x"), ["flag", "xv"]).join(
        doubled_ranks("yv", "r2y"), ["flag", "yv"]
    )

    def moments(xc: str, yc: str, pfx: str) -> list:
        dx = F.col(xc).cast("decimal(12,0)")
        dy = F.col(yc).cast("decimal(12,0)")
        return [
            F.sum(dx).cast("decimal(38,0)").alias(f"{pfx}sx"),
            F.sum(dy).cast("decimal(38,0)").alias(f"{pfx}sy"),
            F.sum(dx * dy).cast("decimal(38,0)").alias(f"{pfx}sxy"),
            F.sum(dx * dx).cast("decimal(38,0)").alias(f"{pfx}sxx"),
            F.sum(dy * dy).cast("decimal(38,0)").alias(f"{pfx}syy"),
        ]

    agg = ranked.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *moments("xv", "yv", "p_"),
        *moments("r2x", "r2y", "s_"),
    )

    def corr(pfx: str) -> str:
        n = "cast(n AS double)"
        sx, sy = f"cast({pfx}sx AS double)", f"cast({pfx}sy AS double)"
        sxy = f"cast({pfx}sxy AS double)"
        sxx, syy = f"cast({pfx}sxx AS double)", f"cast({pfx}syy AS double)"
        return (
            f"round(({n} * {sxy} - {sx} * {sy})"
            f" / (sqrt({n} * {sxx} - {sx} * {sx})"
            f" * sqrt({n} * {syy} - {sy} * {sy})), 4)"
        )

    return agg.selectExpr(
        "flag AS l_returnflag",
        "n",
        f"{corr('p_')} AS pearson_r",
        f"{corr('s_')} AS spearman_rho",
    ).orderBy("l_returnflag")


def _oracle_stats_spearman() -> str:
    def corr(pfx: str) -> str:
        n = "n::DOUBLE"
        sx, sy = f"{pfx}sx::DOUBLE", f"{pfx}sy::DOUBLE"
        sxy = f"{pfx}sxy::DOUBLE"
        sxx, syy = f"{pfx}sxx::DOUBLE", f"{pfx}syy::DOUBLE"
        return (
            f"ROUND(({n} * {sxy} - {sx} * {sy})"
            f" / (sqrt({n} * {sxx} - {sx} * {sx})"
            f" * sqrt({n} * {syy} - {sy} * {sy})), 4)"
        )

    return f"""
WITH sp_li AS (
  SELECT l_returnflag AS flag,
         ROUND(l_quantity * 100)::BIGINT AS xv,
         ROUND(l_extendedprice * 100)::BIGINT AS yv,
         l_orderkey, l_linenumber
  FROM lineitem
),
sp_rx AS (
  SELECT flag, xv, (MIN(rn) + MAX(rn))::BIGINT AS r2x FROM (
    SELECT flag, xv, ROW_NUMBER() OVER (PARTITION BY flag
        ORDER BY xv, l_orderkey, l_linenumber) AS rn FROM sp_li
  ) GROUP BY 1, 2
),
sp_ry AS (
  SELECT flag, yv, (MIN(rn) + MAX(rn))::BIGINT AS r2y FROM (
    SELECT flag, yv, ROW_NUMBER() OVER (PARTITION BY flag
        ORDER BY yv, l_orderkey, l_linenumber) AS rn FROM sp_li
  ) GROUP BY 1, 2
),
sp_r AS (
  SELECT li.flag, li.xv, li.yv, rx.r2x, ry.r2y
  FROM sp_li li
  JOIN sp_rx rx ON li.flag = rx.flag AND li.xv = rx.xv
  JOIN sp_ry ry ON li.flag = ry.flag AND li.yv = ry.yv
),
sp_a AS (
  SELECT flag, COUNT(*)::BIGINT AS n,
         SUM(xv) AS p_sx, SUM(yv) AS p_sy, SUM(xv * yv) AS p_sxy,
         SUM(xv * xv) AS p_sxx, SUM(yv * yv) AS p_syy,
         SUM(r2x) AS s_sx, SUM(r2y) AS s_sy, SUM(r2x * r2y) AS s_sxy,
         SUM(r2x * r2x) AS s_sxx, SUM(r2y * r2y) AS s_syy
  FROM sp_r GROUP BY 1
)
SELECT flag AS l_returnflag, n,
       {corr('p_')} AS pearson_r,
       {corr('s_')} AS spearman_rho
FROM sp_a ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# text_char_entropy — character-entropy quality gate, q10 fixed point
# ---------------------------------------------------------------------------

#: low-entropy gate: 4.0 bits/char in q10 fixed point
_ENTROPY_LOW_Q10 = 4096


def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy — the classic
    boilerplate/spam/encoding-damage gate (low entropy = repeated
    template text or character-level junk; CCNet and Gopher both gate
    on close cousins). ENTIRELY integer: each character class
    contributes cnt * plog2((n << 20) div cnt) in q10 fixed point
    (the repo's piecewise-linear log2 — operators/corpus._plog2_cols,
    oracle twin hashing.duckdb_plog2_sql; no libm, whose ulps differ
    cross-engine), and the per-doc entropy is the floored q10 mean.
    At sf0.01 the corpus spans 3763..4330 q10 (3.67..4.23 bits/char)
    with ~15% of docs under the 4.0-bit gate — real verdict texture.

    Scale shape: one explode to (doc, char) rows, one partial-agg
    shuffle to (doc, char) classes, one to docs — the word-count plan
    with characters; output is corpus-sized, map-side combined. No
    UDFs, no collect."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # split('') yields the character array in ONE pass — the
    # substring(text, i, 1) form re-scans from the string head per
    # character (O(len^2) per doc, measured 2x slower at sf0.1).
    # Empty docs are dropped (entropy is undefined at n=0; Spark's
    # split('', '') yields [''] which would divide by zero, while the
    # oracle's range(1, 1) is simply empty — review finding)
    chars = docs.filter("char_length(text) >= 1").selectExpr(
        "doc_id",
        "char_length(text) AS n",
        "explode(split(text, '')) AS ch",
    )
    from .operators.corpus import _plog2_cols

    cls = chars.groupBy("doc_id", "n", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    term = _plog2_cols("(shiftleft(cast(n AS bigint), 20) div cnt)")
    per_doc = cls.groupBy("doc_id", "n").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.expr(f"sum(cnt * {term})").cast("long").alias("t"),
    )
    return per_doc.selectExpr(
        "doc_id",
        "cast(n AS bigint) AS n_chars",
        "n_distinct AS n_distinct_chars",
        "t div n AS entropy_q10",
        f"CASE WHEN t div n < {_ENTROPY_LOW_Q10} THEN 1L ELSE 0L END AS is_low",
    ).orderBy("doc_id")


def _oracle_text_char_entropy() -> str:
    term = hashing.duckdb_plog2_sql("((n << 20) // cnt)")
    return f"""
WITH ce_ch AS (
  SELECT doc_id, len(text)::BIGINT AS n,
         unnest(list_transform(range(1, len(text) + 1),
                i -> substr(text, i, 1))) AS ch
  FROM documents
),
ce_c AS (
  SELECT doc_id, n, ch, COUNT(*)::BIGINT AS cnt FROM ce_ch GROUP BY 1, 2, 3
),
ce_d AS (
  SELECT doc_id, n, COUNT(*)::BIGINT AS n_distinct,
         SUM(cnt * {term})::BIGINT AS t
  FROM ce_c GROUP BY 1, 2
)
SELECT doc_id, n AS n_chars, n_distinct AS n_distinct_chars,
       (t // n)::BIGINT AS entropy_q10,
       (CASE WHEN t // n < {_ENTROPY_LOW_Q10} THEN 1 ELSE 0 END)::BIGINT
         AS is_low
FROM ce_d ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# events_acf — autocorrelation function of the hourly event-count series
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 6, 12, 24)
_HOUR_US = 3_600_000_000


def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series at lags
    1/2/3/6/12/24 — the seasonality detector that tells a pipeline
    whether hourly/daily structure exists BEFORE it fits
    orders_seasonal_decomp-style models (Box & Jenkins: r_k =
    sum_(t<=n-k)(x_t - mu)(x_(t+k) - mu) / sum(x_t - mu)^2, with the
    GLOBAL mean and variance in the denominator).

    Exactness: the series is dense (missing hours are genuine zeros —
    a sparse series would silently skip gaps and misalign every lag),
    counts and all cross-moment sums (sum x_t*x_(t+k), head/tail sums,
    pair counts, global S/SS) are exact BIGINTs; r_k is one
    closed-form double expression over those sums, identically
    parenthesized on both engines, rounded to 4. Hour bucketing uses
    FLOORED division (epoch micros; floor_div_sql convention).

    Scale shape: one partial-agg shuffle to hours (the series is
    calendar-sized from then on — 720 rows at sf0.01, bounded by time
    span, not volume), a 6x lag expansion of the tiny series, one
    equi-join on shifted hour, and a 1-row global broadcast. 100 TB
    story: identical — only the first rollup sees data volume."""
    from .functions.text import normalize_event_time

    ev = normalize_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    # the hourly rollup is the ONLY data-sized pass, but it feeds the
    # min/max agg + the grid join, and the dense series feeds three
    # branches (shifted, the join probe, the global moments) — persist
    # both or the events scan re-executes per branch (review finding)
    hours = (
        ev.selectExpr(floor_div_sql("ts_us", _HOUR_US) + " AS hi")
        .groupBy("hi")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    # dense calendar grid: missing hours are zeros, not gaps
    series = (
        hours.agg(F.min("hi").alias("lo"), F.max("hi").alias("hi2"))
        .selectExpr("explode(sequence(lo, hi2)) AS hi")
        .join(hours, "hi", "left")
        .selectExpr("hi", "coalesce(c, 0L) AS c")
        .persist()
    )
    lags = ",".join(str(k) for k in _ACF_LAGS)
    shifted = series.selectExpr(
        f"explode(array({lags})) AS lag", "hi + lag AS hi", "c AS c_head"
    )
    pairs = shifted.join(series, "hi").groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("c_head") * F.col("c")).cast("long").alias("sxy"),
        F.sum("c_head").cast("long").alias("sh"),
        F.sum("c").cast("long").alias("st"),
    )
    glob = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    return (
        pairs.crossJoin(F.broadcast(glob))
        .selectExpr(
            "cast(lag AS bigint) AS lag",
            "n_pairs",
            "round((cast(sxy AS double)"
            " - (cast(s AS double) / cast(n AS double))"
            " * (cast(sh AS double) + cast(st AS double))"
            " + cast(n_pairs AS double)"
            " * (cast(s AS double) / cast(n AS double))"
            " * (cast(s AS double) / cast(n AS double)))"
            " / (cast(ss AS double)"
            " - cast(n AS double)"
            " * (cast(s AS double) / cast(n AS double))"
            " * (cast(s AS double) / cast(n AS double))), 4) AS acf",
        )
        .orderBy("lag")
    )


def _oracle_events_acf() -> str:
    hour = hashing.duckdb_floor_div_sql("epoch_us(ts)", _HOUR_US)
    lags = ", ".join(f"({k})" for k in _ACF_LAGS)
    return f"""
WITH acf_h AS (
  SELECT {hour} AS hi, COUNT(*)::BIGINT AS c FROM events GROUP BY 1
),
acf_mm AS (SELECT MIN(hi) AS lo, MAX(hi) AS hi2 FROM acf_h),
acf_s AS (
  SELECT g.hi, COALESCE(h.c, 0)::BIGINT AS c
  FROM (SELECT lo + unnest(range(0, hi2 - lo + 1)) AS hi FROM acf_mm) g
  LEFT JOIN acf_h h ON g.hi = h.hi
),
acf_p AS (
  SELECT l.lag, COUNT(*)::BIGINT AS n_pairs,
         SUM(a.c * b.c)::BIGINT AS sxy,
         SUM(a.c)::BIGINT AS sh, SUM(b.c)::BIGINT AS st
  FROM (VALUES {lags}) l(lag)
  JOIN acf_s a ON TRUE
  JOIN acf_s b ON b.hi = a.hi + l.lag
  GROUP BY 1
),
acf_g AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(c)::BIGINT AS s,
         SUM(c * c)::BIGINT AS ss
  FROM acf_s
)
SELECT lag::BIGINT AS lag, n_pairs,
       ROUND((sxy::DOUBLE
              - (s::DOUBLE / n::DOUBLE) * (sh::DOUBLE + st::DOUBLE)
              + n_pairs::DOUBLE
                * (s::DOUBLE / n::DOUBLE) * (s::DOUBLE / n::DOUBLE))
             / (ss::DOUBLE
                - n::DOUBLE
                  * (s::DOUBLE / n::DOUBLE) * (s::DOUBLE / n::DOUBLE)), 4)
         AS acf
FROM acf_p CROSS JOIN acf_g
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# dedup_edit_pairs — prefix-blocked edit-distance near-dup verification
# ---------------------------------------------------------------------------

#: normalized-prefix blocking key width (characters)
_EDIT_PREFIX = 40
#: skew cap: blocks larger than this are dropped (boilerplate prefixes)
_EDIT_BLOCK_CAP = 16
#: report cap: candidate pairs farther than this are not near-dups
_EDIT_MAX_DIST = 12
#: duplicate verdict threshold on the full normalized text
_EDIT_DUP_DIST = 6


def q_dedup_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup verification: block candidate pairs on
    the normalized 40-char prefix, then VERIFY each pair with the
    exact Levenshtein distance over the full normalized text — the
    precision tier above MinHash/SimHash candidates (those measure set
    overlap; edit distance measures the actual edit script a
    copy-paste-with-tweaks produces). At sf0.01 the blocked candidates
    split into 24 pairs at distance 4 and one at 8, so the d<=6
    duplicate verdict has real texture.

    Normalization strips to lowercase ASCII alphanumerics+space
    BEFORE anything else, which also pins cross-engine parity:
    levenshtein over pure-ASCII strings is identical in Spark and
    DuckDB (no multibyte ambiguity). Distances, lengths and the ppm
    similarity are all integers.

    Scale shape: the blocking key is a tiny derived column — the pair
    generation is an equi-join on it, never all-pairs, and blocks
    larger than 16 docs are dropped (the MinHash skew-cap convention:
    a viral boilerplate prefix would otherwise produce a quadratic
    block). The plan is STAGED for the duplicate-heavy case (sf1
    soak: 10 identical copies per doc put the naive plan into a
    225k-identical-pair Levenshtein grind): identical normalized
    texts collapse first (everything downstream — block key, distance,
    lengths — derives from norm, so the relation is unchanged and the
    unchanged oracle proves it), the block census counts RAW docs via
    cluster weights, the O(len^2) DP runs ONCE per distinct text
    pair, and within-cluster pairs expand as distance-0 rows."""
    # the normalized projection is the dominant cost (a full
    # char-class rewrite of every doc) — persist it once
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr(
            "doc_id",
            "lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '')) AS norm",
        )
        .withColumn("fp", F.md5("norm"))  # internal collapse key only
        .persist()
    )
    clusters = docs.groupBy("fp").agg(
        F.min("doc_id").alias("rep_id"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    mem = docs.select("doc_id", "fp").join(
        clusters.select("fp", "rep_id"), "fp"
    ).persist()  # consumed by both expansion joins + the live set
    reps = (
        docs.join(clusters, "fp")
        .filter(F.col("doc_id") == F.col("rep_id"))
        .selectExpr(
            "rep_id",
            "norm",
            "k",
            f"substring(norm, 1, {_EDIT_PREFIX}) AS bkey",
        )
    )
    # census over RAW docs (sum of cluster sizes) — cap semantics
    # identical to the unstaged plan
    kept_keys = (
        reps.groupBy("bkey")
        .agg(F.sum("k").alias("bn"))
        .filter((F.col("bn") >= 2) & (F.col("bn") <= _EDIT_BLOCK_CAP))
        .select("bkey")
    )
    blocked = reps.join(kept_keys, "bkey").persist()
    a, b = blocked.alias("a"), blocked.alias("b")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.rep_id") < F.col("b.rep_id")),
        )
        .select(
            F.col("a.rep_id").alias("ra"),
            F.col("b.rep_id").alias("rb"),
            F.levenshtein(F.col("a.norm"), F.col("b.norm")).cast("long").alias(
                "dist"
            ),
            F.char_length(F.col("a.norm")).cast("long").alias("len_ra"),
            F.char_length(F.col("b.norm")).cast("long").alias("len_rb"),
        )
        .filter(F.col("dist") <= _EDIT_MAX_DIST)
    )
    cross = (
        rep_pairs.join(
            mem.select(F.col("doc_id").alias("da"), F.col("rep_id").alias("ra")),
            "ra",
        )
        .join(
            mem.select(F.col("doc_id").alias("db"), F.col("rep_id").alias("rb")),
            "rb",
        )
        .selectExpr(
            "least(da, db) AS id_a",
            "greatest(da, db) AS id_b",
            "dist",
            "CASE WHEN da < db THEN len_ra ELSE len_rb END AS len_a",
            "CASE WHEN da < db THEN len_rb ELSE len_ra END AS len_b",
        )
    )
    live = mem.join(
        blocked.select("rep_id", F.char_length("norm").cast("long").alias("ln")),
        "rep_id",
    )
    la, lb = live.alias("la"), live.alias("lb")
    within = (
        la.join(
            lb,
            (F.col("la.rep_id") == F.col("lb.rep_id"))
            & (F.col("la.doc_id") < F.col("lb.doc_id")),
        )
        .selectExpr(
            "la.doc_id AS id_a",
            "lb.doc_id AS id_b",
            "0L AS dist",
            "la.ln AS len_a",
            "lb.ln AS len_b",
        )
    )
    return (
        cross.unionByName(within)
        .selectExpr(
            "id_a",
            "id_b",
            "dist",
            "len_a",
            "len_b",
            "1000000L - (1000000L * dist) div greatest(len_a, len_b, 1L)"
            " AS sim_ppm",
            f"CASE WHEN dist <= {_EDIT_DUP_DIST} THEN 1L ELSE 0L END AS is_dup",
        )
        .orderBy("id_a", "id_b")
    )


def _oracle_dedup_edit_pairs() -> str:
    return f"""
WITH ed_d AS (
  SELECT doc_id,
         lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS norm
  FROM documents
),
ed_k AS (
  SELECT doc_id, norm, substr(norm, 1, {_EDIT_PREFIX}) AS bkey FROM ed_d
),
ed_keys AS (
  SELECT bkey FROM ed_k GROUP BY 1
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {_EDIT_BLOCK_CAP}
),
ed_b AS (SELECT k.* FROM ed_k k JOIN ed_keys USING (bkey)),
ed_p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         levenshtein(a.norm, b.norm)::BIGINT AS dist,
         len(a.norm)::BIGINT AS len_a, len(b.norm)::BIGINT AS len_b
  FROM ed_b a JOIN ed_b b
    ON a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, dist, len_a, len_b,
       (1000000 - (1000000 * dist) // greatest(len_a, len_b, 1))::BIGINT
         AS sim_ppm,
       (CASE WHEN dist <= {_EDIT_DUP_DIST} THEN 1 ELSE 0 END)::BIGINT
         AS is_dup
FROM ed_p
WHERE dist <= {_EDIT_MAX_DIST}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# events_policy_ips — off-policy evaluation: DM / IPS / doubly-robust
# ---------------------------------------------------------------------------


def q_events_policy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation (Dudik, Langford & Li 2011; Li et al.
    2011 replay): treat the event log as a logged bandit — arms are
    event types, the reward is the event value — split it at the time
    midpoint, pick the target policy "always play the arm with the
    best train-half mean reward", and estimate that policy's
    eval-half value three ways:

    - v_dm      direct method: the train-half mean of the chosen arm
                (pure model, biased if the world drifted)
    - v_ips     inverse propensity scoring over the eval half with the
                train-half empirical propensity (unbiased, noisy)
    - v_dr      doubly robust: DM + propensity-corrected residual
    - v_logged  the logged behavior policy's eval-half mean (baseline)

    This is the measurement layer of every RLHF-data / recommendation
    pipeline: IPS vs DM disagreement IS the drift signal. Exactness:
    rewards integerize to cents; the arm argmax uses integer ppm means
    (ties by arm name); all four estimates are closed-form doubles
    over exact integer sums, rounded to 4.

    Scale shape: one pass to (arm, half) partials (map-side combined),
    a bounded arms-sized argmax via one ordered-array aggregate (no
    window, no rank self-join — plans are trees), and 1-row broadcast
    assembly. Nothing data-sized shuffles twice."""
    from .functions.text import normalize_event_time

    ev = normalize_event_time(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).selectExpr(
        "ts_us",
        "event_type AS arm",
        "cast(round(value * 100) AS bigint) AS cents",
    )
    mid = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid"))
    halves = ev.crossJoin(F.broadcast(mid)).selectExpr(
        "arm",
        "cents",
        "CASE WHEN ts_us <= mid THEN 1L ELSE 0L END AS is_train",
    )
    return policy_estimates(policy_arm_partials(halves))


def policy_arm_partials(halves: DataFrame) -> DataFrame:
    """Per-arm logged-bandit state (arm, s_tr, n_tr, s_ev, n_ev) from
    (arm, cents, is_train) rows. MERGEABLE: component-wise BIGINT sums,
    so micro-batch partials merged by a groupBy-sum equal the batch
    state — the streaming twin's contract
    (streaming/ingest.stream_policy_ips)."""
    return halves.groupBy("arm").agg(
        F.sum(F.when(F.col("is_train") == 1, F.col("cents")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s_tr"),
        F.sum("is_train").cast("long").alias("n_tr"),
        F.sum(F.when(F.col("is_train") == 0, F.col("cents")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s_ev"),
        F.sum(1 - F.col("is_train")).cast("long").alias("n_ev"),
    )


def merge_policy_states(*states: DataFrame) -> DataFrame:
    """Merge per-arm partial states (associative + commutative:
    component-wise sums)."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), states)
    return merged.groupBy("arm").agg(
        F.sum("s_tr").cast("long").alias("s_tr"),
        F.sum("n_tr").cast("long").alias("n_tr"),
        F.sum("s_ev").cast("long").alias("s_ev"),
        F.sum("n_ev").cast("long").alias("n_ev"),
    )


def policy_estimates(per_arm: DataFrame) -> DataFrame:
    """Assemble the DM / IPS / DR one-row report from per-arm state —
    a pure function of the mergeable state, shared by the batch query
    and the streaming twin."""
    # argmax train-half ppm mean, ties by arm name: ordered-array pick
    # (integer div for the ppm — a double `/` could truncate across an
    # integer boundary the exact division doesn't). Arms with NO
    # train-half events are ineligible as the target policy (no
    # propensity, and the ppm would divide by zero — review finding);
    # the filter is mirrored in the oracle.
    star = per_arm.filter(F.col("n_tr") > 0).selectExpr(
        "*", "-((1000000L * s_tr) div n_tr) AS neg_ppm"
    ).agg(
        F.min(
            F.struct(
                F.col("neg_ppm"),
                F.col("arm").alias("arm"),
                "s_tr",
                "n_tr",
                "s_ev",
                "n_ev",
            )
        ).alias("st")
    ).select(
        F.col("st.arm").alias("arm_star"),
        F.col("st.s_tr").alias("s_tr_star"),
        F.col("st.n_tr").alias("n_tr_star"),
        F.col("st.s_ev").alias("s_ev_star"),
        F.col("st.n_ev").alias("n_ev_star"),
    )
    glob = per_arm.agg(
        F.sum("n_tr").cast("long").alias("n_train"),
        F.sum("s_ev").cast("long").alias("s_eval"),
        F.sum("n_ev").cast("long").alias("n_eval"),
    )
    qhat = "(cast(s_tr_star AS double) / cast(n_tr_star AS double))"
    corr = (
        "cast(n_train AS double) / (cast(n_tr_star AS double)"
        " * cast(n_eval AS double))"
    )
    return star.crossJoin(F.broadcast(glob)).selectExpr(
        "arm_star",
        "n_train",
        "n_eval",
        "(1000000L * n_tr_star) div n_train AS p_star_ppm",
        "round(cast(s_eval AS double) / cast(n_eval AS double) / 100.0D, 4)"
        " AS v_logged",
        f"round({qhat} / 100.0D, 4) AS v_dm",
        f"round(cast(s_ev_star AS double) * ({corr}) / 100.0D, 4) AS v_ips",
        f"round(({qhat} + (cast(s_ev_star AS double)"
        f" - cast(n_ev_star AS double) * {qhat}) * ({corr})) / 100.0D, 4)"
        " AS v_dr",
    )


def _oracle_events_policy_ips() -> str:
    return """
WITH ip_e AS (
  SELECT epoch_us(ts) AS ts_us, event_type AS arm,
         ROUND(value * 100)::BIGINT AS cents
  FROM events
),
ip_m AS (SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid FROM ip_e),
ip_h AS (
  SELECT arm, cents,
         CASE WHEN ts_us <= mid THEN 1 ELSE 0 END AS is_train
  FROM ip_e CROSS JOIN ip_m
),
ip_a AS (
  SELECT arm,
         SUM(CASE WHEN is_train = 1 THEN cents ELSE 0 END)::BIGINT AS s_tr,
         SUM(is_train)::BIGINT AS n_tr,
         SUM(CASE WHEN is_train = 0 THEN cents ELSE 0 END)::BIGINT AS s_ev,
         SUM(1 - is_train)::BIGINT AS n_ev
  FROM ip_h GROUP BY 1
),
ip_star AS (
  SELECT arm AS arm_star, s_tr AS s_tr_star, n_tr AS n_tr_star,
         s_ev AS s_ev_star, n_ev AS n_ev_star
  FROM ip_a
  WHERE n_tr > 0
  ORDER BY (1000000 * s_tr) // n_tr DESC, arm ASC
  LIMIT 1
),
ip_g AS (
  SELECT SUM(n_tr)::BIGINT AS n_train, SUM(s_ev)::BIGINT AS s_eval,
         SUM(n_ev)::BIGINT AS n_eval
  FROM ip_a
)
SELECT arm_star, n_train, n_eval,
       ((1000000 * n_tr_star) // n_train)::BIGINT AS p_star_ppm,
       ROUND(s_eval::DOUBLE / n_eval::DOUBLE / 100.0, 4) AS v_logged,
       ROUND((s_tr_star::DOUBLE / n_tr_star::DOUBLE) / 100.0, 4) AS v_dm,
       ROUND(s_ev_star::DOUBLE
             * (n_train::DOUBLE / (n_tr_star::DOUBLE * n_eval::DOUBLE))
             / 100.0, 4) AS v_ips,
       ROUND(((s_tr_star::DOUBLE / n_tr_star::DOUBLE)
              + (s_ev_star::DOUBLE
                 - n_ev_star::DOUBLE
                   * (s_tr_star::DOUBLE / n_tr_star::DOUBLE))
                * (n_train::DOUBLE / (n_tr_star::DOUBLE * n_eval::DOUBLE)))
             / 100.0, 4) AS v_dr
FROM ip_star CROSS JOIN ip_g
"""


# ---------------------------------------------------------------------------
# sim_lof_outliers — Local Outlier Factor over the LSH kNN graph
# ---------------------------------------------------------------------------

_LOF_K = 5
_LOF_TOP = 15


def sim_lof_candidates(emb: DataFrame, staged: bool = True) -> DataFrame:
    """The (qid, id, dist2) candidate edge table feeding the LOF kNN
    window — naive (raw-point multiprobe bucket join) or STAGED
    through the unique-vector collapse (identical vectors have
    identical int8 codes, buckets, and pairwise dist2, so the code
    distance is computed once per unique-vector pair and the
    tier-pruned expansion provably contains every point's true top-k;
    see operators/similarity.py). Selected kNN rows — and the oracle
    hash — are identical by construction; the dup-heavy fixture test
    asserts naive == staged on the full query output. The r7 sf1
    soak measured the naive plan at ~195 s on the 90%-dup corpus
    (in-bucket pair work grows with cluster size squared); the staged
    edge set is O(corpus * k * tiers)."""
    from .operators.similarity import (
        bucket_id,
        sq_code_expr,
        tier_pruned_expand,
        vec_exact_collapse,
    )
    from .queries_ext import LSH_DIM, LSH_PLANES

    dist2 = (
        "aggregate(zip_with(codes, qcodes, (x, y) -> (x - y) * (x - y)),"
        " 0L, (a, v) -> a + v)"
    )
    if not staged:
        coded = emb.select(
            F.col("vec_id").alias("id"),
            F.expr(sq_code_expr("embedding")).alias("codes"),
            bucket_id(F.col("embedding"), LSH_DIM, LSH_PLANES).alias("bucket"),
        )
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p))
                for p in range(LSH_PLANES)
            ],
        )
        q = coded.select(
            F.col("id").alias("qid"),
            F.col("codes").alias("qcodes"),
            F.explode(probes).alias("bucket"),
        )
        return (
            coded.join(q, "bucket")
            .filter(F.col("id") != F.col("qid"))
            .selectExpr("qid", "id", f"{dist2} AS dist2")
        )
    uniq, mem = vec_exact_collapse(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    )
    coded = uniq.select(
        F.col("id").alias("rb"),
        F.expr(sq_code_expr("vec")).alias("codes"),
        bucket_id(F.col("vec"), LSH_DIM, LSH_PLANES).alias("bucket"),
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(LSH_PLANES)],
    )
    q = coded.select(
        F.col("rb").alias("ra"),
        F.col("codes").alias("qcodes"),
        F.explode(probes).alias("bucket"),
    )
    # NO ra != rb filter: the self pair (dist2 = 0 by the same
    # expression) carries each cluster's k_A - 1 identical candidates
    rep_cand = coded.join(q, "bucket").selectExpr("ra", "rb", f"{dist2} AS m")
    return tier_pruned_expand(rep_cand, uniq, mem, k=_LOF_K).withColumnRenamed(
        "m", "dist2"
    )


def q_sim_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000) over the embedding
    corpus — the density-aware outlier score that a global distance
    threshold cannot express (a point is an outlier relative to ITS
    neighborhood's density): the embedding-space data-quality audit
    for mislabeled / out-of-distribution vectors before they enter
    training.

    kNN comes from the repo's LSH machinery (hamming-1 multiprobe
    bucket equi-join over UNIQUE vectors — the staged collapse, see
    :func:`sim_lof_candidates`); distances are EXACT integers in
    int8-SQ code space (the sq_int8 quantization), so k-distance,
    reachability distance, and every sum below the final ratio are
    BIGINTs. Points with fewer than k bucket candidates — or with a
    neighbor that lacks its own k-distance — drop out (documented
    LSH-sparsity horizon, deterministic on both engines). The lone
    float is the lrd ratio: an order-pinned fold of 1/sum_reach over
    the 5 neighbors in neighbor-id order, assembled identically on
    both engines and rounded to 4.

    Scale shape: candidate generation is the banded equi-join over
    unique vectors (never all-pairs, never duplicate-quadratic); the
    kNN window partitions by query id; everything after the kNN edge
    table (k-dist, reach, lrd, LOF) joins node-sized tables. 100 TB
    story: identical to the LSH kNN join family — bucket key
    partitioning end to end."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return sim_lof_report(emb, staged=True)


def sim_lof_report(emb: DataFrame, staged: bool = True) -> DataFrame:
    """The LOF pipeline from an embeddings frame (vec_id, embedding) —
    shared by the registry query and the naive==staged fixture test."""
    from pyspark.sql import Window

    cand = sim_lof_candidates(emb, staged=staged)
    w = Window.partitionBy("qid").orderBy(F.asc("dist2"), F.asc("id"))
    # the kNN edge table feeds THREE branches (k-dist, reachability,
    # the lrd fold) — plans are trees, so without a persist the bucket
    # join + window would re-execute per branch
    knn = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _LOF_K)
        .select("qid", "id", "dist2")
        .persist()
    )
    kd = (
        knn.groupBy("qid")
        .agg(
            F.max("dist2").cast("long").alias("kdist"),
            F.count(F.lit(1)).alias("nn"),
        )
        .filter(F.col("nn") == _LOF_K)
        .select(F.col("qid").alias("id"), "kdist")
    )
    reach = knn.join(kd, "id").selectExpr(
        "qid AS a", "id AS b", "greatest(dist2, kdist) AS reach"
    )
    s = (
        reach.groupBy("a")
        .agg(
            F.sum("reach").cast("long").alias("sr"),
            F.count(F.lit(1)).alias("nn"),
        )
        .filter(F.col("nn") == _LOF_K)
        .selectExpr("a", "greatest(sr, 1L) AS s")
    )
    # order-pinned fold of 1/s_b over the 5 neighbors, in neighbor-id order
    inv = (
        knn.join(s.selectExpr("a AS id", "s AS sb"), "id")
        .groupBy("qid")
        .agg(
            F.sort_array(F.collect_list(F.struct("id", "sb"))).alias("arr")
        )
        .filter(F.size("arr") == _LOF_K)
        .selectExpr(
            "qid AS a",
            "aggregate(arr, cast(0.0 AS double),"
            " (acc, x) -> acc + 1.0D / cast(x.sb AS double)) AS invsum",
        )
    )
    return (
        s.join(inv, "a")
        .join(kd.selectExpr("id AS a", "kdist"), "a")
        .selectExpr(
            "a AS id",
            "kdist AS k_dist2",
            "s AS sum_reach",
            f"round((cast(s AS double) / {_LOF_K}.0D) * invsum, 4) AS lof",
        )
        .orderBy(F.desc("lof"), F.asc("id"))
        .limit(_LOF_TOP)
    )


def _oracle_sim_lof_outliers() -> str:
    from .operators.similarity import hyperplane
    from .queries_ext import _DUCK_DOT, LSH_DIM, LSH_PLANES

    def plane_lit(p: int) -> str:
        return (
            "[" + ", ".join(f"{x!r}::DOUBLE" for x in hyperplane(p, LSH_DIM)) + "]"
        )

    bucket = " + ".join(
        f"(CASE WHEN {_DUCK_DOT.format(a='embedding', b=plane_lit(p))} >= 0"
        f" THEN 1::BIGINT ELSE 0 END << {p})"
        for p in range(LSH_PLANES)
    )
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << p})" for p in range(LSH_PLANES)]
    )
    return f"""
WITH lof_e AS (
  SELECT vec_id AS id,
         list_transform(embedding,
             x -> CAST(floor((CAST(x AS DOUBLE) + 1.0) * 127.5 + 0.5)
                       AS BIGINT)) AS codes,
         ({bucket}) AS bucket
  FROM embeddings
),
lof_q AS (
  SELECT id AS qid, codes AS qcodes, pbucket
  FROM lof_e, unnest([{probes}]) AS u(pbucket)
),
lof_c AS (
  SELECT q.qid, e.id,
         list_sum(list_transform(range(1, {LSH_DIM} + 1),
             i -> (e.codes[i] - q.qcodes[i])
                  * (e.codes[i] - q.qcodes[i])))::BIGINT AS dist2
  FROM lof_e e JOIN lof_q q ON e.bucket = q.pbucket
  WHERE e.id != q.qid
),
lof_k AS (
  SELECT qid, id, dist2 FROM (
    SELECT qid, id, dist2,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY dist2 ASC, id ASC) AS rnk
    FROM lof_c
  ) WHERE rnk <= {_LOF_K}
),
lof_kd AS (
  SELECT qid AS id, MAX(dist2)::BIGINT AS kdist
  FROM lof_k GROUP BY 1 HAVING COUNT(*) = {_LOF_K}
),
lof_r AS (
  SELECT k.qid AS a, k.id AS b, greatest(k.dist2, d.kdist) AS reach
  FROM lof_k k JOIN lof_kd d ON k.id = d.id
),
lof_s AS (
  SELECT a, greatest(SUM(reach), 1)::BIGINT AS s
  FROM lof_r GROUP BY 1 HAVING COUNT(*) = {_LOF_K}
),
lof_inv AS (
  SELECT k.qid AS a,
         list_reduce(['0.0'::DOUBLE]
             || list_transform(list(sb.s ORDER BY k.id),
                    v -> 1.0 / (v::DOUBLE)),
             (acc, x) -> acc + x) AS invsum
  FROM lof_k k JOIN lof_s sb ON k.id = sb.a
  GROUP BY 1 HAVING COUNT(*) = {_LOF_K}
)
SELECT s.a AS id, d.kdist AS k_dist2, s.s AS sum_reach,
       ROUND((s.s::DOUBLE / {_LOF_K}.0) * i.invsum, 4) AS lof
FROM lof_s s
JOIN lof_inv i ON s.a = i.a
JOIN lof_kd d ON s.a = d.id
ORDER BY ROUND((s.s::DOUBLE / {_LOF_K}.0) * i.invsum, 4) DESC, s.a ASC
LIMIT {_LOF_TOP}
"""


# ---------------------------------------------------------------------------
# corpus_textrank — TextRank keyword extraction via PageRank fixed point
# ---------------------------------------------------------------------------

#: content-word gate (crude stopword filter, deterministic cross-engine)
_TEXTRANK_MIN_LEN = 4
#: co-occurrence support threshold (scale knob: bounds the word graph)
_TEXTRANK_MIN_CO = 3
_TEXTRANK_ITERS = 3
_TEXTRANK_TOP = 20


def q_corpus_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph — adjacent content-word pairs
    (length >= 4, the deterministic stopword gate) with support >= 3
    become undirected edges, and three fixed-point iterations of the
    repo's INTEGER PageRank (operators/graph.pagerank — the exact
    algebra the graph_pagerank oracle already unrolls) score every
    word. Top-20 by rank = the corpus keyword set; the unsupervised
    topic signal a training-data pipeline uses for mixture/curriculum
    decisions without labels.

    Node ids are the words themselves (pagerank is id-type-agnostic);
    ranks are q-fixed-point BIGINTs end to end, so the oracle is exact
    with no float contract.

    Scale shape: the co-occurrence rollup is the bigram-counting plan
    (array ops in the row, one pair-keyed partial-agg shuffle); the
    support threshold bounds the graph to vocabulary size, and the
    iteration loop is the partition-once-reuse pagerank discipline —
    no collect in the body."""
    from .functions.text import tokens
    from .operators.graph import pagerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens(F.col("text"))
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    e0 = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .filter(
            F.col("w2").isNotNull()
            & (F.length("w1") >= _TEXTRANK_MIN_LEN)
            & (F.length("w2") >= _TEXTRANK_MIN_LEN)
            & (F.col("w1") != F.col("w2"))
        )
    )
    ec = (
        e0.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _TEXTRANK_MIN_CO)
    )
    edges = (
        ec.selectExpr("w1 AS src", "w2 AS dst")
        .union(ec.selectExpr("w2 AS src", "w1 AS dst"))
        .distinct()
    )
    pr = pagerank(edges, iters=_TEXTRANK_ITERS)
    return (
        pr.selectExpr("node AS word", "pr_fp")
        .orderBy(F.desc("pr_fp"), F.asc("word"))
        .limit(_TEXTRANK_TOP)
    )


def _oracle_corpus_textrank() -> str:
    from .operators.graph import duckdb_pagerank_sql

    edges_cte = f"""tr_tok AS (
  SELECT doc_id, {hashing.duckdb_tokens_sql('text')} AS ts FROM documents
),
tr_p AS (
  SELECT unnest(list_transform(range(1, len(ts)),
         i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS s
  FROM tr_tok
),
tr_ec AS (
  SELECT s.w1 AS w1, s.w2 AS w2, COUNT(*) AS c
  FROM tr_p
  WHERE len(s.w1) >= {_TEXTRANK_MIN_LEN} AND len(s.w2) >= {_TEXTRANK_MIN_LEN}
    AND s.w1 != s.w2
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TEXTRANK_MIN_CO}
),
edges AS MATERIALIZED (
  SELECT w1 AS src, w2 AS dst FROM tr_ec
  UNION
  SELECT w2, w1 FROM tr_ec
)"""
    pr = duckdb_pagerank_sql(edges_cte, iters=_TEXTRANK_ITERS)
    final = f"""
SELECT node AS word, pr_fp
FROM r{_TEXTRANK_ITERS}
ORDER BY pr_fp DESC, word ASC
LIMIT {_TEXTRANK_TOP}"""
    return pr.replace(
        f"SELECT node, pr_fp FROM r{_TEXTRANK_ITERS}", final
    )


# ---------------------------------------------------------------------------
# zorder_hilbert — Hilbert-curve clustering key (the Z-order upgrade)
# ---------------------------------------------------------------------------

_HILBERT_BITS = 10
_HILBERT_MASK = (1 << _HILBERT_BITS) - 1


def _hilbert_steps(bits: int) -> list[tuple[str, str, str]]:
    """Per-step (x, y, d) SELECT expressions for the canonical xy2d
    loop (one tuple per bit, most-significant first). The SQL text is
    ENGINE-NEUTRAL — only CASE/&/*/+/- — so Spark's selectExpr chain
    and the DuckDB CTE chain evaluate character-identical expressions
    step for step."""
    mask = (1 << bits) - 1
    steps = []
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        # quadrant index (3*rx) XOR ry spelled as a CASE ladder so no
        # engine-specific xor syntax enters the shared text
        q = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 AND {ry} = 1 THEN 1"
            f" WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
        )
        d_new = f"d + {s * s} * {q}"
        x_new = (
            f"(CASE WHEN {ry} = 1 THEN x"
            f" WHEN {rx} = 1 THEN {mask} - y ELSE y END)"
        )
        y_new = (
            f"(CASE WHEN {ry} = 1 THEN y"
            f" WHEN {rx} = 1 THEN {mask} - x ELSE x END)"
        )
        steps.append((x_new, y_new, d_new))
    return steps


def q_zorder_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over the same two part dimensions
    as zorder_layout — the layout tier ABOVE Morton order: the Hilbert
    curve never takes the long diagonal jumps Z-order takes at bit
    boundaries, so consecutive rows stay spatially adjacent and
    row-group min/max boxes are tighter on BOTH dimensions (this is
    the curve behind Databricks liquid clustering and Amazon S3
    spatial indexing). The canonical xy2d loop (Wikipedia's
    rotate-and-accumulate form) is unrolled into 10 engine-neutral
    CASE/bit-mask steps — pure integers, no UDF, whole-stage-codegen
    friendly — and the query returns the first 500 rows of the layout
    order (the leading row group), exactly zorder_layout's contract so
    the two layouts are directly comparable.

    Scale shape: map-only key computation + TakeOrdered; at write
    time this is a sort-before-write clustering key like any other —
    the 100 TB story is zorder_layout's, with strictly better
    locality."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    df = part.selectExpr(
        "p_partkey",
        f"p_partkey & {_HILBERT_MASK} AS zx",
        f"cast(p_size AS bigint) & {_HILBERT_MASK} AS zy",
        f"p_partkey & {_HILBERT_MASK} AS x",
        f"cast(p_size AS bigint) & {_HILBERT_MASK} AS y",
        "cast(0 AS bigint) AS d",
    )
    for x_new, y_new, d_new in _hilbert_steps(_HILBERT_BITS):
        df = df.selectExpr(
            "p_partkey",
            "zx",
            "zy",
            f"{x_new} AS x",
            f"{y_new} AS y",
            f"{d_new} AS d",
        )
    return (
        df.selectExpr("p_partkey", "zx", "zy", "d AS hval")
        .orderBy("hval", "p_partkey")
        .limit(500)
    )


def _oracle_zorder_hilbert() -> str:
    ctes = [
        f"""h0 AS (
  SELECT p_partkey,
         (p_partkey & {_HILBERT_MASK})::BIGINT AS zx,
         (CAST(p_size AS BIGINT) & {_HILBERT_MASK})::BIGINT AS zy,
         (p_partkey & {_HILBERT_MASK})::BIGINT AS x,
         (CAST(p_size AS BIGINT) & {_HILBERT_MASK})::BIGINT AS y,
         0::BIGINT AS d
  FROM part
)"""
    ]
    for t, (x_new, y_new, d_new) in enumerate(
        _hilbert_steps(_HILBERT_BITS), start=1
    ):
        ctes.append(
            f"""h{t} AS (
  SELECT p_partkey, zx, zy,
         {x_new} AS x, {y_new} AS y, {d_new} AS d
  FROM h{t - 1}
)"""
        )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT p_partkey, zx, zy, d AS hval
FROM h{_HILBERT_BITS}
ORDER BY hval, p_partkey
LIMIT 500
"""


# ---------------------------------------------------------------------------
# stats_chi2_independence — contingency-table chi-square test
# ---------------------------------------------------------------------------

#: chi-square 95% critical value at dof=(5-1)(3-1)=8, in ppm
_CHI2_CRIT_PPM_DOF8 = 15_507_313


def q_stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between order priority
    and order status — the contingency-table complement of the
    goodness-of-fit test events_srm_check runs: are two categorical
    columns associated, the first question any feature-selection or
    leakage audit asks. chi2 = sum over cells of (N*O - R*C)^2 /
    (N*R*C), kept EXACT-integer: the per-cell term floors once
    ((N*O - R*C)^2 div (R*C), documented), the ppm total floors once
    by N — no float fold over cells exists, so cell order cannot
    matter. On this synthetic data the null HOLDS (chi2 ~ 3.9M ppm vs
    the 15.5M critical value at dof 8) — the negative verdict is the
    texture, exactly like the Mann-Whitney panel.

    Scale shape: one cell rollup (bounded by the category-domain
    product, not row count), two margin rollups of the CELL table, a
    broadcast margins join, and a 1-row total. The fact table is
    scanned once."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells = (
        orders.groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rm = cells.groupBy("pri").agg(F.sum("o").cast("long").alias("r"))
    cm = cells.groupBy("st").agg(F.sum("o").cast("long").alias("c"))
    glob = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("pri").cast("long").alias("n_r"),
        F.countDistinct("st").cast("long").alias("n_c"),
    )
    # (n*o - r*c)^2 passes 2^63 once n reaches millions, so the square
    # lives in DECIMAL(38,0) and the floor division is the EXACT
    # remainder construction ((big - big % m) / m is exactly divisible,
    # so the decimal divide has no rounding exposure) — the HUGEINT `//`
    # twin truncates identically on the non-negative numerator
    terms = (
        cells.join(F.broadcast(rm), "pri")
        .join(F.broadcast(cm), "st")
        .crossJoin(F.broadcast(glob))
        .selectExpr(
            "n",
            "n_r",
            "n_c",
            # operands widen BEFORE the multiply — n*o in BIGINT would
            # wrap silently at ~3e9 rows (second review pass)
            "cast(n AS decimal(19,0)) * o - cast(r AS decimal(19,0)) * c"
            " AS d",
            "cast(r AS decimal(19,0)) * c AS m",
        )
        .selectExpr(
            "n",
            "n_r",
            "n_c",
            "cast((d * d - (d * d) % m) / m AS bigint) AS t",
        )
    )
    return terms.groupBy("n", "n_r", "n_c").agg(
        F.expr("(1000000L * sum(t)) div max(n)").alias("chi2_ppm")
    ).selectExpr(
        "n",
        "(n_r - 1L) * (n_c - 1L) AS dof",
        "chi2_ppm",
        f"cast({_CHI2_CRIT_PPM_DOF8} AS bigint) AS crit_ppm",
        f"CASE WHEN chi2_ppm > {_CHI2_CRIT_PPM_DOF8} THEN 0L ELSE 1L END"
        " AS independent",
    )


def _oracle_stats_chi2_independence() -> str:
    return f"""
WITH ci_cells AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         COUNT(*)::BIGINT AS o
  FROM orders GROUP BY 1, 2
),
ci_r AS (SELECT pri, SUM(o)::BIGINT AS r FROM ci_cells GROUP BY 1),
ci_c AS (SELECT st, SUM(o)::BIGINT AS c FROM ci_cells GROUP BY 1),
ci_g AS (
  SELECT SUM(o)::BIGINT AS n,
         COUNT(DISTINCT pri)::BIGINT AS n_r,
         COUNT(DISTINCT st)::BIGINT AS n_c
  FROM ci_cells
),
ci_t AS (
  SELECT g.n, g.n_r, g.n_c,
         SUM(((g.n::HUGEINT * x.o - r.r::HUGEINT * c.c)
              * (g.n::HUGEINT * x.o - r.r::HUGEINT * c.c))
             // (r.r::HUGEINT * c.c))::BIGINT AS st
  FROM ci_cells x
  JOIN ci_r r USING (pri)
  JOIN ci_c c USING (st)
  CROSS JOIN ci_g g
  GROUP BY 1, 2, 3
)
SELECT n, (n_r - 1) * (n_c - 1) AS dof,
       ((1000000 * st) // n)::BIGINT AS chi2_ppm,
       {_CHI2_CRIT_PPM_DOF8}::BIGINT AS crit_ppm,
       (CASE WHEN (1000000 * st) // n > {_CHI2_CRIT_PPM_DOF8}
             THEN 0 ELSE 1 END)::BIGINT AS independent
FROM ci_t
"""


# ---------------------------------------------------------------------------
# orders_anova_f — one-way ANOVA F test on exact integer moments
# ---------------------------------------------------------------------------

#: F(4, inf) 95% critical value — n - k is ~15k here, the asymptote holds
_ANOVA_F_CRIT = 2.372


def q_orders_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of order price by priority — the
    parametric sibling of orders_kruskal_wallis (that one tests
    location via ranks; this one tests means via variance
    decomposition, and together they bracket the distributional
    question). SSB and SSW come from the textbook identities over
    exact integer sums (S_g, Q_g = sum of squared cents, n_g): SSW =
    Q - sum S_g^2/n_g, SSB = sum S_g^2/n_g - S^2/n. Squared sums pass
    2^63, so the sums stay exact integers (DECIMAL/HUGEINT inside the
    engines) and enter doubles only in the final closed-form F and
    eta^2 — identical parenthesization both engines, rounded to 4.
    The null HOLDS on uniform synthetic prices (F ~ 1.47 vs 2.37
    critical) — the negative verdict is the texture.

    Scale shape: ONE partial-aggregated pass to k group rows, then
    arithmetic on the k-row table. Nothing else touches the fact
    table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    g = orders.selectExpr(
        "o_orderpriority AS grp",
        "cast(round(o_totalprice * 100) AS bigint) AS cents",
    ).groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("cents").cast("decimal(38,0)").alias("s_g"),
        F.sum(
            F.col("cents").cast("decimal(19,0)")
            * F.col("cents").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("q_g"),
    )
    glob = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("decimal(38,0)").alias("s"),
        F.sum("q_g").cast("decimal(38,0)").alias("q"),
    )
    # the sum of S_g^2/n_g is a float fold — pin its order (by group
    # name) with an ordered-array aggregate, never an unordered SUM
    pinned = g.agg(
        F.sort_array(F.collect_list(F.struct("grp", "s_g", "n_g"))).alias("arr")
    ).selectExpr(
        "aggregate(arr, cast(0.0 AS double), (acc, x) ->"
        " acc + cast(x.s_g AS double) * cast(x.s_g AS double)"
        " / cast(x.n_g AS double)) AS sg2n"
    )
    return glob.crossJoin(F.broadcast(pinned)).selectExpr(
        "k",
        "n",
        "round(((sg2n - cast(s AS double) * cast(s AS double)"
        " / cast(n AS double)) / (cast(k AS double) - 1.0D))"
        " / ((cast(q AS double) - sg2n) / (cast(n AS double)"
        " - cast(k AS double))), 4) AS f_stat",
        "round((sg2n - cast(s AS double) * cast(s AS double)"
        " / cast(n AS double)) / (cast(q AS double)"
        " - cast(s AS double) * cast(s AS double) / cast(n AS double)), 4)"
        " AS eta_sq",
    ).selectExpr(
        "k",
        "n",
        "f_stat",
        "eta_sq",
        f"CASE WHEN f_stat > {_ANOVA_F_CRIT}D THEN 1L ELSE 0L END"
        " AS significant",
    )


def _oracle_orders_anova_f() -> str:
    return f"""
WITH af_g AS (
  SELECT o_orderpriority AS grp, COUNT(*)::BIGINT AS n_g,
         SUM(ROUND(o_totalprice * 100)::BIGINT) AS s_g,
         SUM(ROUND(o_totalprice * 100)::BIGINT
             * ROUND(o_totalprice * 100)::BIGINT) AS q_g
  FROM orders GROUP BY 1
),
af_glob AS (
  SELECT COUNT(*)::BIGINT AS k, SUM(n_g)::BIGINT AS n,
         SUM(s_g) AS s, SUM(q_g) AS q,
         list_reduce(['0.0'::DOUBLE]
             || list_transform(list(struct_pack(s_g := s_g, n_g := n_g)
                                    ORDER BY grp),
                    x -> x.s_g::DOUBLE * x.s_g::DOUBLE / x.n_g::DOUBLE),
             (acc, v) -> acc + v) AS sg2n
  FROM af_g
)
SELECT k, n,
       ROUND(((sg2n - s::DOUBLE * s::DOUBLE / n::DOUBLE)
              / (k::DOUBLE - 1.0))
             / ((q::DOUBLE - sg2n) / (n::DOUBLE - k::DOUBLE)), 4)
         AS f_stat,
       ROUND((sg2n - s::DOUBLE * s::DOUBLE / n::DOUBLE)
             / (q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE), 4)
         AS eta_sq,
       (CASE WHEN ROUND(((sg2n - s::DOUBLE * s::DOUBLE / n::DOUBLE)
              / (k::DOUBLE - 1.0))
             / ((q::DOUBLE - sg2n) / (n::DOUBLE - k::DOUBLE)), 4)
             > {_ANOVA_F_CRIT} THEN 1 ELSE 0 END)::BIGINT AS significant
FROM af_glob
"""


# ---------------------------------------------------------------------------
# sketch_f2_moment — AMS second-frequency-moment sketch
# ---------------------------------------------------------------------------

_AMS_GROUPS = 4
_AMS_PER_GROUP = 4


def q_sketch_f2_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 sketch (Alon, Matias & Szegedy 1996 — the Godel-prize
    construction): estimate the second frequency moment sum(f_v^2) of
    the user-id stream with 16 +/-1 counters instead of a per-user
    table. Each estimator i keeps s_i = sum over events of sign_i(
    user) where sign_i is bit i of the md5-56 hash (positional bit
    consumption -> md5, per the repo's hash-choice rule); E[s_i^2] =
    F2. Median of 4 group means (means floor by 4, lower median —
    both documented) gives the estimate; the exact F2 runs alongside
    and err_ppm prices the sketch, the KMV/HLL report convention.

    Everything is integer: counters, squares, means, median, error.

    Scale shape: the sketch is ONE aggregation pass emitting 16 longs
    total (vs the per-user shuffle of the exact path, also shown) —
    and the counters are trivially mergeable (sums), so this is the
    distributed/streaming form; 16 sums in one projection, no explode."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    est = f2_estimate(f2_sign_partials(ev))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    )
    return est.crossJoin(F.broadcast(exact)).selectExpr(
        "n_events",
        "n_users",
        "f2_exact",
        "f2_ams",
        "(1000000L * abs(f2_ams - f2_exact)) div f2_exact AS err_ppm",
    )


def f2_sign_partials(ev: DataFrame, key_col: str = "user_id") -> DataFrame:
    """The AMS sketch state: one row of 16 sign counters + n_events.
    MERGEABLE (component-wise sums) — the streaming twin's contract
    (streaming/ingest.stream_f2_sketch)."""
    sign_sums = []
    for i in range(_AMS_GROUPS * _AMS_PER_GROUP):
        bit = f"(({_spark_md5_56(f'cast({key_col} AS string)')} >> {i}) & 1)"
        sign_sums.append(
            F.expr(f"sum(CASE WHEN {bit} = 1 THEN 1L ELSE -1L END)").alias(
                f"s{i}"
            )
        )
    return ev.agg(*sign_sums, F.count(F.lit(1)).cast("long").alias("n_events"))


def merge_f2_states(*states: DataFrame) -> DataFrame:
    """Merge AMS sketch states (associative + commutative sums)."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), states)
    cols = [
        F.sum(f"s{i}").cast("long").alias(f"s{i}")
        for i in range(_AMS_GROUPS * _AMS_PER_GROUP)
    ]
    return merged.agg(*cols, F.sum("n_events").cast("long").alias("n_events"))


def f2_estimate(sk: DataFrame) -> DataFrame:
    """Median-of-means F2 estimate — a pure function of the sketch
    state (floored group means, lower median)."""
    means = []
    for gidx in range(_AMS_GROUPS):
        terms = " + ".join(
            f"s{gidx * _AMS_PER_GROUP + j} * s{gidx * _AMS_PER_GROUP + j}"
            for j in range(_AMS_PER_GROUP)
        )
        means.append(f"(({terms}) div {_AMS_PER_GROUP})")
    return sk.selectExpr(
        "n_events",
        f"element_at(array_sort(array({', '.join(means)})),"
        f" {(_AMS_GROUPS + 1) // 2}) AS f2_ams",
    )


def _oracle_sketch_f2_moment() -> str:
    h = hashing.duckdb_md5_hash56_sql("user_id::VARCHAR")
    sums = ",\n         ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END)::BIGINT"
        f" AS s{i}"
        for i in range(_AMS_GROUPS * _AMS_PER_GROUP)
    )
    means = ", ".join(
        "(("
        + " + ".join(
            f"s{g * _AMS_PER_GROUP + j} * s{g * _AMS_PER_GROUP + j}"
            for j in range(_AMS_PER_GROUP)
        )
        + f") // {_AMS_PER_GROUP})"
        for g in range(_AMS_GROUPS)
    )
    return f"""
WITH f2_h AS (SELECT {h} AS h FROM events),
f2_sk AS (
  SELECT {sums},
         COUNT(*)::BIGINT AS n_events
  FROM f2_h
),
f2_est AS (
  SELECT n_events,
         (list_sort([{means}]))[{(_AMS_GROUPS + 1) // 2}]::BIGINT AS f2_ams
  FROM f2_sk
),
f2_ex AS (
  SELECT SUM(c * c)::BIGINT AS f2_exact, COUNT(*)::BIGINT AS n_users
  FROM (SELECT user_id, COUNT(*)::BIGINT AS c FROM events GROUP BY 1)
)
SELECT n_events, n_users, f2_exact, f2_ams,
       ((1000000 * abs(f2_ams - f2_exact)) // f2_exact)::BIGINT AS err_ppm
FROM f2_est CROSS JOIN f2_ex
"""


# ---------------------------------------------------------------------------
# sim_eval_map — multi-query MAP/MRR for the ANN tiers
# ---------------------------------------------------------------------------


def q_sim_eval_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Average Precision over the 16-query evaluation set — the
    multi-QUERY retrieval metric the single-query nDCG report
    (sim_eval_ndcg) cannot see: AP@10 per query against the exact-
    cosine top-10 ground truth, averaged over all queries, for the
    plain and hamming-1-multiprobe LSH tiers. MAP is rank-sensitive
    where recall@k (sim_recall_report, same query set) is not — a
    tier that finds the right neighbors in the wrong order scores
    lower here, so the two reports together separate coverage loss
    from ordering loss.

    Integer end to end: P@j floors to ppm, AP floors by k, MAP floors
    by n_queries (each floor documented and mirrored); MRR is the mean
    of floored 1e6/first-hit-rank. Queries with no retrieved hits
    contribute zero through the full-query-list left join (dropping
    them would inflate the mean — the classic eval bug).

    Scale shape: ground truth broadcasts the bounded 16-query set
    (the sim_recall_report plan); hits are (qid, id) equi-joins; all
    per-rank work happens on n_q*k rows."""
    from .operators.similarity import lsh_bucketed_neighbors, topk_neighbors
    from .queries_ext import LSH_DIM, LSH_PLANES, RECALL_K, RECALL_N_Q

    from pyspark.sql import Window

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    queries = emb.filter(F.col("id") < RECALL_N_Q).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    # the exact ground truth (full-corpus scan + per-qid window) feeds
    # BOTH tier rows — persist or it executes twice (review finding)
    truth = topk_neighbors(emb, queries, k=RECALL_K).select("qid", "id").persist()
    qlist = spark.range(RECALL_N_Q).select(F.col("id").cast("long").alias("qid"))

    def tier_row(name: str, multiprobe: bool) -> DataFrame:
        ann = lsh_bucketed_neighbors(
            emb,
            queries,
            dim=LSH_DIM,
            k=RECALL_K,
            n_planes=LSH_PLANES,
            multiprobe=multiprobe,
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
        ranked = ann.withColumn("rank", F.row_number().over(w)).select(
            "qid", "id", "rank"
        )
        hits = ranked.join(
            truth.withColumn("hit", F.lit(1)), ["qid", "id"], "left"
        ).selectExpr("qid", "rank", "coalesce(hit, 0) AS hit")
        cumw = (
            Window.partitionBy("qid")
            .orderBy("rank")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        per_q = (
            hits.withColumn("cum", F.sum("hit").over(cumw))
            .groupBy("qid")
            .agg(
                F.expr(
                    "sum(hit * ((1000000L * cum) div rank))"
                    f" div {RECALL_K} AS ap_ppm"
                ),
                F.expr(
                    "coalesce(1000000L div min(CASE WHEN hit = 1 THEN rank END),"
                    " 0L) AS rr_ppm"
                ),
            )
        )
        full = qlist.join(per_q, "qid", "left").selectExpr(
            "coalesce(ap_ppm, 0L) AS ap_ppm", "coalesce(rr_ppm, 0L) AS rr_ppm"
        )
        return full.agg(
            F.lit(name).alias("tier"),
            F.lit(RECALL_N_Q).cast("long").alias("n_queries"),
            F.lit(RECALL_K).cast("long").alias("k"),
            F.expr(f"sum(ap_ppm) div {RECALL_N_Q}").alias("map_ppm"),
            F.expr(f"sum(rr_ppm) div {RECALL_N_Q}").alias("mrr_ppm"),
        )

    return (
        tier_row("lsh", False)
        .unionByName(tier_row("lsh_multiprobe", True))
        .orderBy("tier")
    )


def _oracle_sim_eval_map() -> str:
    from .operators.similarity import hyperplane
    from .queries_ext import _DUCK_DOT, LSH_DIM, LSH_PLANES, RECALL_K, RECALL_N_Q

    def plane_lit(p: int) -> str:
        return (
            "[" + ", ".join(f"{x!r}::DOUBLE" for x in hyperplane(p, LSH_DIM)) + "]"
        )

    bucket = " + ".join(
        f"(CASE WHEN {_DUCK_DOT.format(a='embedding', b=plane_lit(p))} >= 0"
        f" THEN 1::BIGINT ELSE 0 END << {p})"
        for p in range(LSH_PLANES)
    )
    flips = ", ".join(f"xor(bucket, {1 << p}::BIGINT)" for p in range(LSH_PLANES))
    cos = (
        f"ROUND({_DUCK_DOT.format(a='e.embedding', b='q.qvec')}"
        f" / (sqrt({_DUCK_DOT.format(a='e.embedding', b='e.embedding')})"
        f" * sqrt({_DUCK_DOT.format(a='q.qvec', b='q.qvec')})), 4)"
    )
    ranked = (
        "SELECT qid, id, rnk AS rank FROM ("
        "SELECT q.qid, e.id,"
        f" ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY {cos} DESC,"
        " e.id ASC) AS rnk"
        " FROM e {join}"
        " WHERE e.id != q.qid"
        f") WHERE rnk <= {RECALL_K}"
    )
    metric = f"""
  SELECT '{{name}}' AS tier, {RECALL_N_Q}::BIGINT AS n_queries,
         {RECALL_K}::BIGINT AS k,
         (SUM(ap_ppm) // {RECALL_N_Q})::BIGINT AS map_ppm,
         (SUM(rr_ppm) // {RECALL_N_Q})::BIGINT AS mrr_ppm
  FROM (
    SELECT ql.qid, COALESCE(p.ap_ppm, 0) AS ap_ppm,
           COALESCE(p.rr_ppm, 0) AS rr_ppm
    FROM (SELECT unnest(range(0, {RECALL_N_Q})) AS qid) ql
    LEFT JOIN (
      SELECT qid,
             (SUM(hit * ((1000000 * cum) // rank)) // {RECALL_K})::BIGINT
               AS ap_ppm,
             COALESCE(1000000 // MIN(CASE WHEN hit = 1 THEN rank END), 0)
               ::BIGINT AS rr_ppm
      FROM (
        SELECT r.qid, r.rank,
               CASE WHEN t.id IS NULL THEN 0 ELSE 1 END AS hit,
               SUM(CASE WHEN t.id IS NULL THEN 0 ELSE 1 END)
                 OVER (PARTITION BY r.qid ORDER BY r.rank) AS cum
        FROM {{rel}} r LEFT JOIN em_truth t ON r.qid = t.qid AND r.id = t.id
      ) GROUP BY qid
    ) p ON ql.qid = p.qid
  )"""
    return f"""
WITH e AS (SELECT vec_id AS id, embedding, ({bucket}) AS bucket FROM embeddings),
q AS (
  SELECT vec_id AS qid, embedding AS qvec, bucket
  FROM (SELECT vec_id, embedding, ({bucket}) AS bucket FROM embeddings)
  WHERE vec_id < {RECALL_N_Q}
),
em_truth AS ({ranked.format(join="CROSS JOIN q")}),
qmp AS (SELECT qid, qvec, unnest([bucket, {flips}]) AS bucket FROM q),
em_lsh AS ({ranked.format(join="JOIN q ON e.bucket = q.bucket")}),
em_lsh_mp AS ({ranked.format(join="JOIN qmp q ON e.bucket = q.bucket")}),
em_rows AS (
  {metric.format(name="lsh", rel="em_lsh")}
  UNION ALL
  {metric.format(name="lsh_multiprobe", rel="em_lsh_mp")}
)
SELECT * FROM em_rows ORDER BY tier
"""


# ---------------------------------------------------------------------------
# orders_ks_test — two-sample Kolmogorov-Smirnov, exact integer D
# ---------------------------------------------------------------------------

_KS_A = "1-URGENT"
_KS_B = "5-LOW"
#: the 95% two-sample coefficient c(alpha) = sqrt(-ln(0.025)/2)
_KS_COEF = 1.358


def q_orders_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: do URGENT and LOW orders
    draw prices from the same DISTRIBUTION — the whole-shape question
    the location tests (Mann-Whitney) and moment tests (ANOVA) can't
    answer. D = max |F_A - F_B| over the pooled support, kept EXACT:
    the supremum is max |cumA * n_B - cumB * n_A| over the distinct-
    cents table (integer cross-multiplication — no float CDFs), and
    only the final statistic and its critical value
    c(.95) * sqrt((n_A+n_B)/(n_A*n_B)) are rounded doubles. The null
    HOLDS on uniform synthetic prices — the negative verdict is the
    texture, like the rest of the testing panel.

    Scale shape: one rollup to the distinct-value table, then two
    composed range-stitch running sums over it (no single-task global
    window — pre_range is idempotent so the second sum reuses the
    first's range partitioning), a 1-row margins broadcast, and a
    1-row max."""
    from .operators.scalable_window import pre_range, running_sum

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vals = (
        orders.filter(F.col("o_orderpriority").isin(_KS_A, _KS_B))
        .selectExpr(
            "cast(round(o_totalprice * 100) AS bigint) AS cents",
            f"CASE WHEN o_orderpriority = '{_KS_A}' THEN 1L ELSE 0L END"
            " AS is_a",
        )
        .groupBy("cents")
        .agg(
            F.sum("is_a").cast("long").alias("c_a"),
            F.sum(1 - F.col("is_a")).cast("long").alias("c_b"),
        )
    )
    # pre_range explicitly so BOTH running sums share one range
    # partitioning (running_sum drops the partition id when the input
    # lacked it, which would re-shuffle the second pass — review
    # finding; pre_range is idempotent only while the id column stays)
    ranged = pre_range(vals, [F.asc("cents")])
    r = running_sum(ranged, [F.asc("cents")], F.col("c_a"), "cum_a")
    r = running_sum(r, [F.asc("cents")], F.col("c_b"), "cum_b")
    g = vals.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
    )
    return (
        r.crossJoin(F.broadcast(g))
        .selectExpr("n_a", "n_b", "abs(cum_a * n_b - cum_b * n_a) AS dn")
        .groupBy("n_a", "n_b")
        .agg(F.max("dn").cast("long").alias("d_num"))
        .selectExpr(
            "n_a",
            "n_b",
            "d_num",
            "round(cast(d_num AS double)"
            " / (cast(n_a AS double) * cast(n_b AS double)), 4) AS ks_stat",
            f"round({_KS_COEF}D * sqrt((cast(n_a AS double)"
            " + cast(n_b AS double)) / (cast(n_a AS double)"
            " * cast(n_b AS double))), 4) AS crit",
        )
        .selectExpr(
            "n_a",
            "n_b",
            "d_num",
            "ks_stat",
            "crit",
            "CASE WHEN ks_stat > crit THEN 0L ELSE 1L END AS same_dist",
        )
    )


def _oracle_orders_ks_test() -> str:
    return f"""
WITH ks_v AS (
  SELECT ROUND(o_totalprice * 100)::BIGINT AS cents,
         SUM(CASE WHEN o_orderpriority = '{_KS_A}' THEN 1 ELSE 0 END)
           ::BIGINT AS c_a,
         SUM(CASE WHEN o_orderpriority = '{_KS_B}' THEN 1 ELSE 0 END)
           ::BIGINT AS c_b
  FROM orders
  WHERE o_orderpriority IN ('{_KS_A}', '{_KS_B}')
  GROUP BY 1
),
ks_c AS (
  SELECT cents,
         SUM(c_a) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(c_b) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM ks_v
),
ks_g AS (
  SELECT SUM(c_a)::BIGINT AS n_a, SUM(c_b)::BIGINT AS n_b FROM ks_v
),
ks_d AS (
  SELECT n_a, n_b,
         MAX(abs(cum_a * n_b - cum_b * n_a))::BIGINT AS d_num
  FROM ks_c CROSS JOIN ks_g
  GROUP BY 1, 2
)
SELECT n_a, n_b, d_num,
       ROUND(d_num::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE), 4) AS ks_stat,
       ROUND({_KS_COEF} * sqrt((n_a::DOUBLE + n_b::DOUBLE)
             / (n_a::DOUBLE * n_b::DOUBLE)), 4) AS crit,
       (CASE WHEN ROUND(d_num::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE), 4)
             > ROUND({_KS_COEF} * sqrt((n_a::DOUBLE + n_b::DOUBLE)
                     / (n_a::DOUBLE * n_b::DOUBLE)), 4)
             THEN 0 ELSE 1 END)::BIGINT AS same_dist
FROM ks_d
"""


# ---------------------------------------------------------------------------
# hilbert_skipping — Hilbert vs Z-order data-skipping head-to-head
# ---------------------------------------------------------------------------

_HSKIP_FILES = 32


def q_hilbert_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head data-skipping report: simulate writing `part` as
    32 equal files under the Hilbert layout AND the Z-order layout
    (same dimensions, same x16 p_size normalization as
    zorder_skipping), collect per-file min/max footer stats, and count
    the files a scan must read for the same three predicates. This is
    the MEASUREMENT behind zorder_hilbert's locality claim: at sf0.01
    Hilbert reads 10/8/2 files where Z-order reads 11/9/2 — the
    unit-step adjacency law turned into a concrete scan-cost win, on
    the identical write budget.

    Same machinery as zorder_skipping: range-stitched global rank +
    arithmetic NTILE (no single-task window), 32-row stats rollups,
    exact integers end to end."""
    from .operators.scalable_window import global_rank, ntile_bucket
    from .queries_ext import _ZORDER_BITS, zorder_col

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n = part.count()
    mask = (1 << _ZORDER_BITS) - 1
    x = F.col("p_partkey").bitwiseAND(F.lit(mask))
    y = (F.col("p_size").cast("long") * F.lit(16)).bitwiseAND(F.lit(mask))
    df = part.select(
        "p_partkey",
        F.col("p_size").cast("long").alias("p_size"),
        zorder_col(x, y).alias("zval"),
        x.alias("x"),
        y.alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    for x_new, y_new, d_new in _hilbert_steps(_HILBERT_BITS):
        df = df.selectExpr(
            "p_partkey",
            "p_size",
            "zval",
            f"{x_new} AS x",
            f"{y_new} AS y",
            f"{d_new} AS d",
        )
    base = df.selectExpr("p_partkey", "p_size", "zval", "d AS hval").persist()
    layouts = (
        ("zorder", [F.col("zval").asc(), F.col("p_partkey").asc()]),
        ("hilbert", [F.col("hval").asc(), F.col("p_partkey").asc()]),
    )
    pieces = []
    for name, order in layouts:
        ranked = global_rank(base, order, out_col="rank")
        stats = (
            ranked.withColumn(
                "file", ntile_bucket(F.col("rank"), n, _HSKIP_FILES)
            )
            .groupBy("file")
            .agg(
                F.min("p_partkey").alias("min_pk"),
                F.max("p_partkey").alias("max_pk"),
                F.min("p_size").alias("min_sz"),
                F.max("p_size").alias("max_sz"),
            )
        )
        hit_pk = (F.col("max_pk") >= 100) & (F.col("min_pk") <= 199)
        hit_sz = (F.col("max_sz") >= 10) & (F.col("min_sz") <= 12)
        pieces.append(
            stats.agg(
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(F.when(hit_pk, 1).otherwise(0)).cast("long").alias("s_pk"),
                F.sum(F.when(hit_sz, 1).otherwise(0)).cast("long").alias("s_sz"),
                F.sum(F.when(hit_pk & hit_sz, 1).otherwise(0))
                .cast("long")
                .alias("s_both"),
            ).selectExpr(
                f"'{name}' AS layout",
                "n_files",
                "stack(3, 'pk_100_199', s_pk, 'sz_10_12', s_sz,"
                " 'both', s_both) AS (predicate, files_scanned)",
            )
        )
    return (
        pieces[0]
        .unionByName(pieces[1])
        .selectExpr(
            "layout",
            "predicate",
            "n_files",
            "files_scanned",
            "(1000000 * (n_files - files_scanned)) div n_files AS skip_ppm",
        )
        .orderBy("layout", "predicate")
    )


def _oracle_hilbert_skipping() -> str:
    from .queries_ext import _ZORDER_BITS

    mask = (1 << _ZORDER_BITS) - 1
    zterms = " + ".join(
        f"((((p_partkey & {mask}) >> {b}) & 1) << {2 * b})"
        f" + (((((CAST(p_size AS BIGINT) * 16) & {mask}) >> {b}) & 1)"
        f" << {2 * b + 1})"
        for b in range(_ZORDER_BITS)
    )
    ctes = [
        f"""hs0 AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, ({zterms}) AS zval,
         (p_partkey & {mask})::BIGINT AS x,
         ((CAST(p_size AS BIGINT) * 16) & {mask})::BIGINT AS y,
         0::BIGINT AS d
  FROM part
)"""
    ]
    for t, (x_new, y_new, d_new) in enumerate(
        _hilbert_steps(_HILBERT_BITS), start=1
    ):
        ctes.append(
            f"""hs{t} AS (
  SELECT p_partkey, p_size, zval,
         {x_new} AS x, {y_new} AS y, {d_new} AS d
  FROM hs{t - 1}
)"""
        )
    agg = """
  SELECT COUNT(*)::BIGINT AS n_files,
         SUM(CASE WHEN max_pk >= 100 AND min_pk <= 199 THEN 1 ELSE 0 END)::BIGINT AS s_pk,
         SUM(CASE WHEN max_sz >= 10 AND min_sz <= 12 THEN 1 ELSE 0 END)::BIGINT AS s_sz,
         SUM(CASE WHEN max_pk >= 100 AND min_pk <= 199
                   AND max_sz >= 10 AND min_sz <= 12 THEN 1 ELSE 0 END)::BIGINT AS s_both
"""
    joined = ",\n".join(ctes)
    h = _HILBERT_BITS
    return f"""
WITH {joined},
hs_base AS (SELECT p_partkey, p_size, zval, d AS hval FROM hs{h}),
hs_zr AS (
  SELECT p_partkey, p_size,
         NTILE({_HSKIP_FILES}) OVER (ORDER BY zval, p_partkey) AS file
  FROM hs_base
),
hs_hr AS (
  SELECT p_partkey, p_size,
         NTILE({_HSKIP_FILES}) OVER (ORDER BY hval, p_partkey) AS file
  FROM hs_base
),
hs_zs AS (
  SELECT file, MIN(p_partkey) AS min_pk, MAX(p_partkey) AS max_pk,
         MIN(p_size) AS min_sz, MAX(p_size) AS max_sz
  FROM hs_zr GROUP BY file
),
hs_hs AS (
  SELECT file, MIN(p_partkey) AS min_pk, MAX(p_partkey) AS max_pk,
         MIN(p_size) AS min_sz, MAX(p_size) AS max_sz
  FROM hs_hr GROUP BY file
),
hs_za AS ({agg} FROM hs_zs),
hs_ha AS ({agg} FROM hs_hs),
hs_rows AS (
  SELECT 'zorder' AS layout, 'pk_100_199' AS predicate, n_files, s_pk AS files_scanned FROM hs_za
  UNION ALL SELECT 'zorder', 'sz_10_12', n_files, s_sz FROM hs_za
  UNION ALL SELECT 'zorder', 'both', n_files, s_both FROM hs_za
  UNION ALL SELECT 'hilbert', 'pk_100_199', n_files, s_pk FROM hs_ha
  UNION ALL SELECT 'hilbert', 'sz_10_12', n_files, s_sz FROM hs_ha
  UNION ALL SELECT 'hilbert', 'both', n_files, s_both FROM hs_ha
)
SELECT layout, predicate, n_files, files_scanned,
       ((1000000 * (n_files - files_scanned)) // n_files)::BIGINT AS skip_ppm
FROM hs_rows
ORDER BY layout, predicate
"""


# ---------------------------------------------------------------------------
# events_stickiness — DAU / WAU / MAU engagement ratios
# ---------------------------------------------------------------------------

_STICKY_WINS = (7, 28)


def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics stickiness: per day, DAU plus the trailing
    7-day (WAU) and 28-day (MAU) distinct-user counts and the
    DAU/WAU, DAU/MAU ppm ratios — THE engagement north-star ratio
    (how many of the monthly users show up on a given day). Distinct
    counts do NOT merge across windows, so the trailing windows come
    from the classic expand trick: each (user, day) activity row
    votes into every report day it is visible from (k = 0..win-1),
    then one distinct per (win, report-day, user). Early days carry
    their partial windows (documented; dropping them would hide
    launch-week ratios).

    Exact integers end to end; days serialize as ISO strings (the
    repo's date-output convention).

    Scale shape: the only data-sized pass is the first distinct to
    the (user, day) activity table, which is bounded by users x days
    — the 35x window fan-out and everything after runs on that
    bounded table, partial-aggregated on (win, day) keys."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ud = ev.selectExpr("user_id", "cast(ts AS date) AS day").distinct().persist()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    wins = ",".join(str(w) for w in _STICKY_WINS)
    expanded = (
        ud.selectExpr("user_id", "day", f"explode(array({wins})) AS win")
        .selectExpr(
            "user_id", "day", "win", "explode(sequence(0, win - 1)) AS k"
        )
        .selectExpr("win", "date_add(day, k) AS rday", "user_id")
        .distinct()
    )
    # clip to observed days (votes past max(day) describe no report day)
    span = ud.agg(F.max("day").alias("mx"))
    rolling = (
        expanded.crossJoin(F.broadcast(span))
        .filter(F.col("rday") <= F.col("mx"))
        .groupBy("win", "rday")
        .agg(F.count(F.lit(1)).cast("long").alias("au"))
    )
    wau = rolling.filter(F.col("win") == _STICKY_WINS[0]).selectExpr(
        "rday AS day", "au AS wau"
    )
    mau = rolling.filter(F.col("win") == _STICKY_WINS[1]).selectExpr(
        "rday AS day", "au AS mau"
    )
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .selectExpr(
            "date_format(day, 'yyyy-MM-dd') AS day",
            "dau",
            "wau",
            "mau",
            "(1000000L * dau) div wau AS dau_wau_ppm",
            "(1000000L * dau) div mau AS dau_mau_ppm",
        )
        .orderBy("day")
    )


def _oracle_events_stickiness() -> str:
    w7, w28 = _STICKY_WINS
    return f"""
WITH st_ud AS (
  SELECT DISTINCT user_id, ts::DATE AS day FROM events
),
st_dau AS (SELECT day, COUNT(*)::BIGINT AS dau FROM st_ud GROUP BY 1),
st_mx AS (SELECT MAX(day) AS mx FROM st_ud),
st_exp AS (
  SELECT DISTINCT w.win, u.day + (k.k::INT) AS rday, u.user_id
  FROM st_ud u
  CROSS JOIN (VALUES ({w7}), ({w28})) w(win)
  JOIN (SELECT unnest(range(0, {w28})) AS k) k ON k.k < w.win
  CROSS JOIN st_mx
  WHERE u.day + (k.k::INT) <= st_mx.mx
),
st_roll AS (
  SELECT win, rday, COUNT(*)::BIGINT AS au FROM st_exp GROUP BY 1, 2
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.au AS wau, m.au AS mau,
       ((1000000 * d.dau) // w.au)::BIGINT AS dau_wau_ppm,
       ((1000000 * d.dau) // m.au)::BIGINT AS dau_mau_ppm
FROM st_dau d
JOIN st_roll w ON w.win = {w7} AND w.rday = d.day
JOIN st_roll m ON m.win = {w28} AND m.rday = d.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# anonymize_generalize_sweep — pick the k-anonymizing bucket width
# ---------------------------------------------------------------------------

_GEN_WIDTHS = (10_000, 25_000, 50_000, 100_000, 250_000)
#: acceptable re-identifiable share: 1% of rows, in ppm
_GEN_RISK_PPM = 10_000


def q_anonymize_generalize_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization-width sweep — the DECISION layer above
    anonymize_kanon_report: for each candidate balance-bucket width,
    recompute the k-anonymity audit over the (nation, bucket) QIDs and
    report rows at risk (classes below k=5); the CHOSEN row is the
    smallest width whose at-risk share is within 1% — minimal
    information loss subject to the privacy budget, the
    Mondrian-style trade-off as one declarative query (the sweep
    shape of corpus_vocab_sweep). At sf0.01 the sweep is monotone
    1494 -> 7 at-risk rows across the five widths and chooses 250000.

    Floored bucketing with a COLUMN divisor (widths are swept, so the
    literal-divisor helper doesn't apply) — same truncate-then-correct
    construction, mirrored verbatim in the oracle.

    Scale shape: one 5x width fan-out of the row stream, partial-agg
    to (width, nation, bucket) classes, then width-keyed rollups and a
    1-row-per-width verdict join."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    widths = ",".join(str(w) for w in _GEN_WIDTHS)
    cls = (
        cust.selectExpr(
            "c_nationkey",
            "cast(round(c_acctbal * 100) AS bigint) AS cents",
            f"explode(array({widths})) AS w",
        )
        .selectExpr(
            "w",
            "c_nationkey",
            "(cents div w) - (CASE WHEN cents % w < 0 THEN 1 ELSE 0 END)"
            " AS bucket",
        )
        .groupBy("w", "c_nationkey", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    per_w = cls.groupBy("w").agg(
        F.sum("k").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("k").cast("long").alias("k_min"),
        F.sum(F.when(F.col("k") < _KANON_K, F.col("k")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_k"),
    ).selectExpr(
        "w",
        "n_classes",
        "k_min",
        "rows_below_k",
        "(1000000L * rows_below_k) div n_rows AS at_risk_ppm",
    )
    best = per_w.filter(F.col("at_risk_ppm") <= _GEN_RISK_PPM).agg(
        F.min("w").alias("w_best")
    )
    return (
        per_w.crossJoin(F.broadcast(best))
        .selectExpr(
            "cast(w AS bigint) AS width_cents",
            "n_classes",
            "k_min",
            "rows_below_k",
            "at_risk_ppm",
            "CASE WHEN w = w_best THEN 1L ELSE 0L END AS chosen",
        )
        .orderBy("width_cents")
    )


def _oracle_anonymize_generalize_sweep() -> str:
    widths = ", ".join(f"({w})" for w in _GEN_WIDTHS)
    return f"""
WITH gs_rows AS (
  SELECT w.w, c_nationkey,
         ROUND(c_acctbal * 100)::BIGINT AS cents
  FROM customer CROSS JOIN (VALUES {widths}) w(w)
),
gs_cls AS (
  SELECT w, c_nationkey,
         (cents // w) - (CASE WHEN cents % w < 0 THEN 1 ELSE 0 END)
           AS bucket,
         COUNT(*)::BIGINT AS k
  FROM gs_rows GROUP BY 1, 2, 3
),
gs_w AS (
  SELECT w, COUNT(*)::BIGINT AS n_classes, MIN(k)::BIGINT AS k_min,
         SUM(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END)::BIGINT
           AS rows_below_k,
         ((1000000 * SUM(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END))
          // SUM(k))::BIGINT AS at_risk_ppm
  FROM gs_cls GROUP BY 1
),
gs_best AS (
  SELECT MIN(w) AS w_best FROM gs_w WHERE at_risk_ppm <= {_GEN_RISK_PPM}
)
SELECT w::BIGINT AS width_cents, n_classes, k_min, rows_below_k,
       at_risk_ppm,
       (CASE WHEN w = w_best THEN 1 ELSE 0 END)::BIGINT AS chosen
FROM gs_w CROSS JOIN gs_best
ORDER BY width_cents
"""


# ---------------------------------------------------------------------------
# events_ab_power — A/B sample-size / runtime power analysis
# ---------------------------------------------------------------------------

#: relative minimum-detectable-effect sweep, in ppm of the metric mean
_POWER_MDE_PPM = (10_000, 20_000, 50_000, 100_000)
#: (z_{alpha/2} + z_beta)^2 at alpha=0.05 two-sided, power 0.80
_POWER_ZSUM_SQ = 7.849


def q_events_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test power analysis — the PLANNING member of the
    experimentation panel (SRM audits it after assignment, CUPED
    shrinks its variance, MW/KW/ANOVA/KS read it out; this one says
    whether the experiment is WORTH RUNNING): per event type, the
    per-arm sample size n = 2 (z_a/2 + z_b)^2 sigma^2 / delta^2 for a
    two-sample test at alpha=.05 / power .80 across a 1/2/5/10%
    relative-MDE sweep, plus the days of traffic that buys at the
    observed event rate. Variance and mean come from exact
    integer-cent moments (one pass); every output number is a
    closed-form double over those sums (identical parenthesization
    both engines) or an exact integer.

    Scale shape: one partial-aggregated pass to per-type moments +
    the observed time span (1-row broadcast); the 4x MDE sweep runs
    on the type-sized table."""
    from .functions.text import normalize_event_time

    ev = normalize_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    # ONE data-sized pass: per-type moments carry their own time span;
    # the global span derives from the type-sized table (a second
    # events scan for min/max was the only other data-sized work —
    # second review pass)
    g = ev.selectExpr(
        "event_type",
        "cast(round(value * 100) AS bigint) AS cents",
        "ts_us",
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(19,0)")
            * F.col("cents").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("q"),
        F.min("ts_us").alias("ts_lo"),
        F.max("ts_us").alias("ts_hi"),
    ).persist()  # feeds the span aggregate AND the sweep — type-sized
    span = g.agg(
        F.expr("(max(ts_hi) - min(ts_lo)) div 86400000000 + 1").alias("days")
    )
    mdes = ",".join(str(m) for m in _POWER_MDE_PPM)
    # sample variance (n-1 denominator), mean, and the normal-
    # approximation sample size; ceil is exact on both engines
    var = (
        "(cast(q AS double) - cast(s AS double) * cast(s AS double)"
        " / cast(n AS double)) / (cast(n AS double) - 1.0D)"
    )
    mean = "(cast(s AS double) / cast(n AS double))"
    delta = f"({mean} * cast(mde_ppm AS double) / 1000000.0D)"
    n_arm = (
        f"cast(ceil(2.0D * {_POWER_ZSUM_SQ}D * ({var})"
        f" / ({delta} * {delta})) AS bigint)"
    )
    return (
        g.selectExpr("*", f"explode(array({mdes})) AS mde_ppm")
        .crossJoin(F.broadcast(span))
        .selectExpr(
            "event_type",
            "cast(mde_ppm AS bigint) AS mde_ppm",
            "n AS n_observed",
            f"round({mean} / 100.0D, 4) AS metric_mean",
            f"round(sqrt({var}) / 100.0D, 4) AS metric_sd",
            f"{n_arm} AS n_per_arm",
            # the observed rate is n/days events per day for this type;
            # both arms together need 2 n_arm events
            f"cast(ceil(cast(2L * {n_arm} AS double)"
            " / (cast(n AS double) / cast(days AS double))) AS bigint)"
            " AS days_needed",
        )
        .orderBy("event_type", "mde_ppm")
    )


def _oracle_events_ab_power() -> str:
    mdes = ", ".join(f"({m})" for m in _POWER_MDE_PPM)
    var = "(q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE) / (n::DOUBLE - 1.0)"
    mean = "(s::DOUBLE / n::DOUBLE)"
    delta = f"({mean} * mde_ppm::DOUBLE / 1000000.0)"
    n_arm = (
        f"CAST(ceil(2.0 * {_POWER_ZSUM_SQ} * ({var})"
        f" / ({delta} * {delta})) AS BIGINT)"
    )
    return f"""
WITH pw_g AS (
  SELECT event_type, COUNT(*)::BIGINT AS n,
         SUM(ROUND(value * 100)::BIGINT)::BIGINT AS s,
         SUM(ROUND(value * 100)::BIGINT * ROUND(value * 100)::BIGINT) AS q
  FROM events GROUP BY 1
),
pw_span AS (
  SELECT (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 86400000000 + 1 AS days
  FROM events
)
SELECT event_type, mde_ppm::BIGINT AS mde_ppm, n AS n_observed,
       ROUND({mean} / 100.0, 4) AS metric_mean,
       ROUND(sqrt({var}) / 100.0, 4) AS metric_sd,
       {n_arm} AS n_per_arm,
       CAST(ceil((2 * {n_arm})::DOUBLE
            / (n::DOUBLE / days::DOUBLE)) AS BIGINT) AS days_needed
FROM pw_g CROSS JOIN (VALUES {mdes}) m(mde_ppm) CROSS JOIN pw_span
ORDER BY event_type, mde_ppm
"""


# ---------------------------------------------------------------------------
# graph_assortativity — degree assortativity of the trade graph
# ---------------------------------------------------------------------------


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over the edges of the repeat-trade graph — THE
    one-number summary of hub structure (negative = hubs attach to
    leaves, the signature of bipartite customer-supplier trade; at
    sf0.01 r = -0.81, a strong disassortative verdict). Each
    undirected edge contributes both orientations, so the moment sums
    are symmetric by construction; degrees and all five moment sums
    are exact integers (DECIMAL(38,0) — degree^2 x edge-count passes
    2^63 at social-graph scale), and r is the closed-form double over
    them, rounded to 4 (the stats_spearman discipline on a graph).

    Scale shape: the edge build is the shared thresholded-trade join
    (queries_wave7 conventions); degrees are one rollup of the
    symmetrized incidence; the moment pass joins the edge table to
    the node-sized degree table twice on its endpoints."""
    from .queries_wave7 import _trade_edges

    edges = _trade_edges(spark, sf_dir)
    sym = edges.selectExpr("src AS u", "dst AS v").unionAll(
        edges.selectExpr("dst AS u", "src AS v")
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    pairs = (
        sym.join(deg.selectExpr("u", "deg AS du"), "u")
        .join(deg.selectExpr("u AS v", "deg AS dv"), "v")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("du").cast("decimal(12,0)")).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("dv").cast("decimal(12,0)")).cast("decimal(38,0)").alias("sy"),
        F.sum(
            F.col("du").cast("decimal(12,0)") * F.col("dv").cast("decimal(12,0)")
        ).cast("decimal(38,0)").alias("sxy"),
        F.sum(
            F.col("du").cast("decimal(12,0)") * F.col("du").cast("decimal(12,0)")
        ).cast("decimal(38,0)").alias("sxx"),
        F.sum(
            F.col("dv").cast("decimal(12,0)") * F.col("dv").cast("decimal(12,0)")
        ).cast("decimal(38,0)").alias("syy"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return agg.crossJoin(F.broadcast(nn)).selectExpr(
        "n_nodes",
        "n div 2 AS n_edges",
        "round((cast(n AS double) * cast(sxy AS double)"
        " - cast(sx AS double) * cast(sy AS double))"
        " / (sqrt(cast(n AS double) * cast(sxx AS double)"
        " - cast(sx AS double) * cast(sx AS double))"
        " * sqrt(cast(n AS double) * cast(syy AS double)"
        " - cast(sy AS double) * cast(sy AS double))), 4) AS assortativity",
    )


def _oracle_graph_assortativity() -> str:
    from .queries_wave7 import _TRADE_EDGES_CTE

    return f"""
WITH {_TRADE_EDGES_CTE},
as_sym AS (
  SELECT src AS u, dst AS v FROM edges
  UNION ALL
  SELECT dst, src FROM edges
),
as_deg AS (SELECT u, COUNT(*)::BIGINT AS deg FROM as_sym GROUP BY 1),
as_p AS (
  SELECT du.deg AS du, dv.deg AS dv
  FROM as_sym s
  JOIN as_deg du ON s.u = du.u
  JOIN as_deg dv ON s.v = dv.u
),
as_a AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(du) AS sx, SUM(dv) AS sy,
         SUM(du * dv) AS sxy, SUM(du * du) AS sxx, SUM(dv * dv) AS syy
  FROM as_p
),
as_n AS (SELECT COUNT(*)::BIGINT AS n_nodes FROM as_deg)
SELECT n_nodes, (n // 2)::BIGINT AS n_edges,
       ROUND((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
             4) AS assortativity
FROM as_a CROSS JOIN as_n
"""


# ---------------------------------------------------------------------------
# lineitem_hill_tail — Hill tail-index estimator, q10 fixed point
# ---------------------------------------------------------------------------

_HILL_K = 100


def q_lineitem_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator (Hill 1975), ratio-excess form: is
    extended price heavy-tailed? The textbook alpha-hat =
    k / sum(ln(x_i / x_(k+1))) is computed through ln(1+e) ~ e on the
    q20 integer ratio excess e_i = (x_i << 20) div x_(k+1) - 2^20 —
    EXACT integer arithmetic with no libm (whose ulps differ
    cross-engine) and no piecewise-log quantization (whose slope is
    off by up to ln2 exactly in the near-1 regime the top tail lives
    in; the first cut used it and read alpha 44% high). First-order
    exact for the small excesses of any dense top tail; the verdict
    alpha < 3 means infinite-ish higher moments — means/variances of
    per-item spend stop converging and every average-based report
    needs robust alternatives. On uniform synthetic prices
    alpha ~ 1022 (validated against a python ln replay): emphatically
    NOT heavy-tailed, the expected negative verdict.

    Scale shape: TakeOrderedAndProject pulls the bounded top-(k+1)
    rows; everything after is array math on one row."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "cast(round(l_extendedprice * 100) AS bigint) AS cents",
        "l_orderkey",
        "l_linenumber",
    )
    top = li.orderBy(
        F.desc("cents"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ).limit(_HILL_K + 1)
    row = top.agg(
        F.sort_array(F.collect_list("cents"), asc=False).alias("arr")
    )
    # alpha_ppm = (k << 20) * 1e6 div sum_excess — exact integers
    return (
        row.selectExpr(
            f"element_at(arr, {_HILL_K + 1}) AS xk1",
            f"slice(arr, 1, {_HILL_K}) AS topk",
        )
        .selectExpr(
            "xk1",
            "aggregate(topk, 0L, (acc, x) ->"
            " acc + (shiftleft(x, 20) div xk1 - 1048576L))"
            " AS sum_excess_q20",
        )
        .selectExpr(
            f"cast({_HILL_K} AS bigint) AS k",
            "xk1 AS xk1_cents",
            "sum_excess_q20",
            f"CASE WHEN sum_excess_q20 > 0 THEN"
            f" ({_HILL_K}L * 1048576L * 1000000L) div sum_excess_q20"
            " ELSE NULL END AS alpha_ppm",
        )
        .selectExpr(
            "k",
            "xk1_cents",
            "sum_excess_q20",
            "alpha_ppm",
            "CASE WHEN alpha_ppm IS NOT NULL AND alpha_ppm < 3000000"
            " THEN 1L ELSE 0L END AS heavy_tailed",
        )
    )


def _oracle_lineitem_hill_tail() -> str:
    return f"""
WITH ht_top AS (
  SELECT ROUND(l_extendedprice * 100)::BIGINT AS cents
  FROM lineitem
  ORDER BY cents DESC, l_orderkey ASC, l_linenumber ASC
  LIMIT {_HILL_K + 1}
),
ht_row AS (
  SELECT list(cents ORDER BY cents DESC) AS arr FROM ht_top
),
ht_s AS (
  SELECT arr[{_HILL_K + 1}] AS xk1,
         list_reduce([0::BIGINT]
             || list_transform(arr[1:{_HILL_K}],
                    x -> ((x << 20) // arr[{_HILL_K + 1}] - 1048576)),
             (acc, v) -> acc + v) AS sum_excess_q20
  FROM ht_row
)
SELECT {_HILL_K}::BIGINT AS k, xk1 AS xk1_cents,
       sum_excess_q20::BIGINT AS sum_excess_q20,
       (CASE WHEN sum_excess_q20 > 0 THEN
          ({_HILL_K}::BIGINT * 1048576 * 1000000) // sum_excess_q20
        ELSE NULL END)::BIGINT AS alpha_ppm,
       (CASE WHEN sum_excess_q20 > 0
             AND ({_HILL_K}::BIGINT * 1048576 * 1000000) // sum_excess_q20
                 < 3000000
             THEN 1 ELSE 0 END)::BIGINT AS heavy_tailed
FROM ht_s
"""


# ---------------------------------------------------------------------------
# multimodal_otsu — Otsu threshold over decoded BMP histograms
# ---------------------------------------------------------------------------


def q_multimodal_otsu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-CHECKED image-binarization pipeline: per doc a
    deterministic BIMODAL gray strip (operators/multimodal.
    gray_pixel_py — mixing ratio doc_id % 11 spreads docs from all-low
    to all-high) is packed into a REAL 24bpp BMP, re-parsed by
    decode_bmp, histogrammed, and fed to Otsu's method (Otsu 1979):
    the threshold maximizing the between-class variance, computed as
    the exact-integer rational argmax f(t) = (s0*n - n0*S)^2 div
    (n0*(n - n0)) over cumulative bin sums — the classic
    segmentation/binarization primitive (document scans, masks,
    quality gates). Everything after the decode is relational: bins
    (<=256 rows per image) through ONE partitioned cumulative window
    and an ordered-array argmax; integer end to end, so the oracle
    recomputes every pixel from the closed form and a decode bug
    anywhere breaks the hash. f's numerator square stays under 2^63
    up to ~6.9k pixels/image worst-case ((n0*n1*255)^2 <= 4064*n^4;
    sf0.1 docs are ~550) — larger frames need the chi2 DECIMAL
    staging.

    Scale shape: synth and decode are map-only mapInPandas; the
    shuffle moves histogram BINS, never pixels."""
    from .operators.multimodal import (
        media_from_documents_gray_bmp,
        media_gray_histogram,
    )

    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the synth+encode+decode chain feeds TWO branches (cumulative
    # window + totals rollup) — persist the bins or the whole codec
    # pipeline executes twice (second review pass)
    bins = media_gray_histogram(media_from_documents_gray_bmp(docs)).persist()
    w = (
        Window.partitionBy("id")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        bins.withColumn("n0", F.sum("cnt").over(w))
        .withColumn("s0", F.sum(F.col("b") * F.col("cnt")).over(w))
    )
    tot = bins.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("b") * F.col("cnt")).cast("long").alias("s"),
    )
    cand = (
        cum.join(tot, "id")
        .filter(F.col("n0") < F.col("n"))
        .selectExpr(
            "id",
            "b",
            "n",
            "n0",
            "((s0 * n - n0 * s) * (s0 * n - n0 * s))"
            " div (n0 * (n - n0)) AS f",
        )
    )
    best = cand.groupBy("id").agg(
        F.min(F.struct(F.negate(F.col("f")).alias("nf"), F.col("b").alias("t"),
                       F.col("n").alias("n"), F.col("n0").alias("n0"))).alias("s")
    )
    return best.selectExpr(
        "id",
        "s.n AS n_pix",
        "s.t AS threshold",
        "-s.nf AS between_var_scaled",
        "(1000000L * (s.n - s.n0)) div s.n AS fg_share_ppm",
    ).orderBy("id")


def _oracle_multimodal_otsu() -> str:
    from .operators.multimodal import _GRAY_HIGH_BASE, _GRAY_LOW_W

    pix = (
        f"CASE WHEN (k % 10) < (doc_id % 11)"
        f" THEN (37 * doc_id + 11 * k) % {_GRAY_LOW_W}"
        f" ELSE {_GRAY_HIGH_BASE} + (23 * doc_id + 7 * k) % {_GRAY_LOW_W} END"
    )
    return f"""
WITH ot_px AS (
  SELECT doc_id AS id, {pix} AS b
  FROM (
    SELECT doc_id, unnest(range(0, GREATEST(16, len(text)))) AS k
    FROM documents
  )
),
ot_bins AS (SELECT id, b::BIGINT AS b, COUNT(*)::BIGINT AS cnt
            FROM ot_px GROUP BY 1, 2),
ot_cum AS (
  SELECT id, b, cnt,
         SUM(cnt) OVER (PARTITION BY id ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n0,
         SUM(b * cnt) OVER (PARTITION BY id ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s0
  FROM ot_bins
),
ot_tot AS (
  SELECT id, SUM(cnt)::BIGINT AS n, SUM(b * cnt)::BIGINT AS s
  FROM ot_bins GROUP BY 1
),
ot_cand AS (
  SELECT c.id, c.b, t.n, c.n0,
         (((c.s0 * t.n - c.n0 * t.s) * (c.s0 * t.n - c.n0 * t.s))
           // (c.n0 * (t.n - c.n0)))::BIGINT AS f
  FROM ot_cum c JOIN ot_tot t ON c.id = t.id
  WHERE c.n0 < t.n
),
ot_best AS (
  SELECT id, n, b AS t, f, n0 FROM (
    SELECT id, b, n, n0, f,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY f DESC, b ASC) AS rnk
    FROM ot_cand
  ) WHERE rnk = 1
)
SELECT id, n AS n_pix, t AS threshold, f AS between_var_scaled,
       ((1000000 * (n - n0)) // n)::BIGINT AS fg_share_ppm
FROM ot_best
ORDER BY id
"""


# ---------------------------------------------------------------------------
# anonymize_tcloseness — t-closeness audit (the privacy trio's third leg)
# ---------------------------------------------------------------------------

#: bucket width = the generalize_sweep's chosen width at sf0.01
_TCLOSE_WIDTH = 250_000
#: t threshold (variational distance, ppm): the classic 0.4
_TCLOSE_T_PPM = 400_000


def q_anonymize_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third leg of the privacy trio: k-anonymity bounds class size,
    l-diversity bounds distinct sensitive values, but a class can pass
    both while its sensitive DISTRIBUTION still leaks (90/10 where the
    population is 20/80). Per equivalence class under the
    generalization the sweep chose (width 250000), t = the variational
    distance between the class's segment distribution and the global
    one — for categorical sensitive attributes the standard EMD
    instantiation, 0.5 * sum |p_s - q_s| — kept EXACT in ppm by cross-
    multiplying counts: t_ppm = 1e6 * sum|c_s*N - g_s*k| div (2*k*N).
    Per nation: the worst class and the count above t = 0.4 (4 of 100
    classes FIRE at sf0.01 — the audit discriminates).

    Scale shape: class x segment cells via one rollup + a dense grid
    join against the segment-sized global table (missing segments
    carry their zero cells — skipping them would UNDERCOUNT t); all
    tables are rollup-sized after the first pass."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    q = cust.selectExpr(
        "c_nationkey",
        floor_div_sql(
            "cast(round(c_acctbal * 100) AS bigint)", _TCLOSE_WIDTH
        )
        + " AS b",
        "c_mktsegment AS s",
    ).persist()  # feeds the global table AND the cell rollup
    g = q.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("gs"))
    n = q.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    cls = q.groupBy("c_nationkey", "b", "s").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    )
    ck = cls.groupBy("c_nationkey", "b").agg(
        F.sum("cs").cast("long").alias("k")
    )
    grid = (
        ck.crossJoin(F.broadcast(g))
        .join(cls, ["c_nationkey", "b", "s"], "left")
        .selectExpr("c_nationkey", "b", "k", "gs", "coalesce(cs, 0L) AS cs")
    )
    t = (
        grid.crossJoin(F.broadcast(n))
        .groupBy("c_nationkey", "b", "k", "nn")
        .agg(F.sum(F.expr("abs(cs * nn - gs * k)")).alias("num"))
        .selectExpr(
            "c_nationkey",
            "(1000000L * num) div (2L * k * nn) AS t_ppm",
        )
    )
    return (
        t.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.max("t_ppm").cast("long").alias("t_max_ppm"),
            F.sum(
                F.when(F.col("t_ppm") > _TCLOSE_T_PPM, 1).otherwise(0)
            ).cast("long").alias("classes_above_t"),
        )
        .orderBy("c_nationkey")
    )


def _oracle_anonymize_tcloseness() -> str:
    bucket = hashing.duckdb_floor_div_sql(
        "ROUND(c_acctbal * 100)::BIGINT", _TCLOSE_WIDTH
    )
    return f"""
WITH tc_q AS (
  SELECT c_nationkey, {bucket} AS b, c_mktsegment AS s FROM customer
),
tc_g AS (SELECT s, COUNT(*)::BIGINT AS gs FROM tc_q GROUP BY 1),
tc_n AS (SELECT COUNT(*)::BIGINT AS nn FROM tc_q),
tc_cls AS (
  SELECT c_nationkey, b, s, COUNT(*)::BIGINT AS cs FROM tc_q GROUP BY 1, 2, 3
),
tc_k AS (
  SELECT c_nationkey, b, SUM(cs)::BIGINT AS k FROM tc_cls GROUP BY 1, 2
),
tc_grid AS (
  SELECT ck.c_nationkey, ck.b, ck.k, g.gs, COALESCE(c.cs, 0)::BIGINT AS cs
  FROM tc_k ck
  CROSS JOIN tc_g g
  LEFT JOIN tc_cls c
    ON c.c_nationkey = ck.c_nationkey AND c.b = ck.b AND c.s = g.s
),
tc_t AS (
  SELECT c_nationkey,
         ((1000000 * SUM(abs(cs * nn - gs * k))) // (2 * k * nn))::BIGINT
           AS t_ppm
  FROM tc_grid CROSS JOIN tc_n
  GROUP BY c_nationkey, b, k, nn
)
SELECT c_nationkey, COUNT(*)::BIGINT AS n_classes,
       MAX(t_ppm)::BIGINT AS t_max_ppm,
       SUM(CASE WHEN t_ppm > {_TCLOSE_T_PPM} THEN 1 ELSE 0 END)::BIGINT
         AS classes_above_t
FROM tc_t GROUP BY 1 ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# lineitem_price_index — chained Laspeyres / Paasche / Fisher price index
# ---------------------------------------------------------------------------


def q_lineitem_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month price indices on MATCHED parts — the
    inflation-measurement shape (Laspeyres weights by base-month
    quantities, Paasche by current, Fisher is their geometric mean;
    the index-number problem every spend dashboard eventually hits).
    Unit values integerize to ppm once per (part, month)
    (uv_ppm = 1e6 * cents div qty), the four index sums are exact
    integers, and each index is an exact-remainder DECIMAL floor
    division (the chi2 staging — 1e6 * sum passes 2^63). Fisher's
    sqrt is the one float: IEEE-correctly-rounded on both engines
    from identical inputs, floored to ppm.

    Scale shape: one partial-agg pass to (part, month) unit values,
    one self-join on (part, month+1) — co-partitioned equi-join —
    and a month-pair rollup. Matched-parts-only is the contract (new
    and exiting parts are composition, not price, change)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_partkey AS p",
        "year(l_shipdate) * 12 + month(l_shipdate) AS m",
        "cast(round(l_extendedprice * 100) AS bigint) AS c",
        "cast(round(l_quantity) AS bigint) AS q",
    )
    pm = (
        li.groupBy("p", "m")
        .agg(F.sum("c").cast("long").alias("c"), F.sum("q").cast("long").alias("q"))
        .selectExpr("p", "m", "(1000000L * c) div q AS uv", "q")
    )
    a, b = pm.alias("a"), pm.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p") == F.col("b.p")) & (F.col("b.m") == F.col("a.m") + 1),
    ).selectExpr(
        "a.m AS m0",
        "a.uv AS uv0",
        "a.q AS q0",
        "b.uv AS uv1",
        "b.q AS q1",
    )
    sums = pairs.groupBy("m0").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("uv1") * F.col("q0")).cast("decimal(38,0)").alias("ln_"),
        F.sum(F.col("uv0") * F.col("q0")).cast("decimal(38,0)").alias("ld"),
        F.sum(F.col("uv1") * F.col("q1")).cast("decimal(38,0)").alias("pn"),
        F.sum(F.col("uv0") * F.col("q1")).cast("decimal(38,0)").alias("pd"),
    )

    def idx(num: str, den: str) -> str:
        big = f"(cast({num} AS decimal(38,0)) * 1000000)"
        return f"cast(({big} - {big} % {den}) / {den} AS bigint)"

    return sums.selectExpr(
        "m0",
        "m0 + 1 AS m1",
        "n_parts",
        f"{idx('ln_', 'ld')} AS laspeyres_ppm",
        f"{idx('pn', 'pd')} AS paasche_ppm",
    ).selectExpr(
        "m0",
        "m1",
        "n_parts",
        "laspeyres_ppm",
        "paasche_ppm",
        "cast(floor(sqrt(cast(laspeyres_ppm AS double)"
        " * cast(paasche_ppm AS double))) AS bigint) AS fisher_ppm",
    ).orderBy("m0")


def _oracle_lineitem_price_index() -> str:
    def idx(num: str, den: str) -> str:
        big = f"({num}::HUGEINT * 1000000)"
        return f"(({big} - {big} % {den}) // {den})::BIGINT"

    return f"""
WITH pi_li AS (
  SELECT l_partkey AS p, year(l_shipdate) * 12 + month(l_shipdate) AS m,
         ROUND(l_extendedprice * 100)::BIGINT AS c,
         ROUND(l_quantity)::BIGINT AS q
  FROM lineitem
),
pi_pm AS (
  SELECT p, m, (1000000 * SUM(c)) // SUM(q) AS uv, SUM(q)::BIGINT AS q
  FROM pi_li GROUP BY 1, 2
),
pi_pairs AS (
  SELECT a.m AS m0, a.uv AS uv0, a.q AS q0, b.uv AS uv1, b.q AS q1
  FROM pi_pm a JOIN pi_pm b ON a.p = b.p AND b.m = a.m + 1
),
pi_s AS (
  SELECT m0, COUNT(*)::BIGINT AS n_parts,
         SUM(uv1 * q0) AS ln_, SUM(uv0 * q0) AS ld,
         SUM(uv1 * q1) AS pn, SUM(uv0 * q1) AS pd
  FROM pi_pairs GROUP BY 1
),
pi_i AS (
  SELECT m0, (m0 + 1)::BIGINT AS m1, n_parts,
         {idx('ln_', 'ld')} AS laspeyres_ppm,
         {idx('pn', 'pd')} AS paasche_ppm
  FROM pi_s
)
SELECT m0::BIGINT AS m0, m1, n_parts, laspeyres_ppm, paasche_ppm,
       CAST(floor(sqrt(laspeyres_ppm::DOUBLE * paasche_ppm::DOUBLE))
            AS BIGINT) AS fisher_ppm
FROM pi_i
ORDER BY m0
"""


WAVE8_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "anonymize_kanon_report": q_anonymize_kanon_report,
    "stats_spearman": q_stats_spearman,
    "text_char_entropy": q_text_char_entropy,
    "events_acf": q_events_acf,
    "dedup_edit_pairs": q_dedup_edit_pairs,
    "events_policy_ips": q_events_policy_ips,
    "sim_lof_outliers": q_sim_lof_outliers,
    "corpus_textrank": q_corpus_textrank,
    "zorder_hilbert": q_zorder_hilbert,
    "stats_chi2_independence": q_stats_chi2_independence,
    "orders_anova_f": q_orders_anova_f,
    "sketch_f2_moment": q_sketch_f2_moment,
    "sim_eval_map": q_sim_eval_map,
    "orders_ks_test": q_orders_ks_test,
    "hilbert_skipping": q_hilbert_skipping,
    "events_stickiness": q_events_stickiness,
    "anonymize_generalize_sweep": q_anonymize_generalize_sweep,
    "events_ab_power": q_events_ab_power,
    "graph_assortativity": q_graph_assortativity,
    "lineitem_hill_tail": q_lineitem_hill_tail,
    "multimodal_otsu": q_multimodal_otsu,
    "anonymize_tcloseness": q_anonymize_tcloseness,
    "lineitem_price_index": q_lineitem_price_index,
}

WAVE8_ORACLES: dict[str, str] = {
    "anonymize_kanon_report": _oracle_anonymize_kanon_report(),
    "stats_spearman": _oracle_stats_spearman(),
    "text_char_entropy": _oracle_text_char_entropy(),
    "events_acf": _oracle_events_acf(),
    "dedup_edit_pairs": _oracle_dedup_edit_pairs(),
    "events_policy_ips": _oracle_events_policy_ips(),
    "sim_lof_outliers": _oracle_sim_lof_outliers(),
    "corpus_textrank": _oracle_corpus_textrank(),
    "zorder_hilbert": _oracle_zorder_hilbert(),
    "stats_chi2_independence": _oracle_stats_chi2_independence(),
    "orders_anova_f": _oracle_orders_anova_f(),
    "sketch_f2_moment": _oracle_sketch_f2_moment(),
    "sim_eval_map": _oracle_sim_eval_map(),
    "orders_ks_test": _oracle_orders_ks_test(),
    "hilbert_skipping": _oracle_hilbert_skipping(),
    "events_stickiness": _oracle_events_stickiness(),
    "anonymize_generalize_sweep": _oracle_anonymize_generalize_sweep(),
    "events_ab_power": _oracle_events_ab_power(),
    "graph_assortativity": _oracle_graph_assortativity(),
    "lineitem_hill_tail": _oracle_lineitem_hill_tail(),
    "multimodal_otsu": _oracle_multimodal_otsu(),
    "anonymize_tcloseness": _oracle_anonymize_tcloseness(),
    "lineitem_price_index": _oracle_lineitem_price_index(),
}
