"""Round-7 wave: output-shard byte balancing, exact stratified split
allocation (largest-remainder), cohort retention triangle, and
integerized Flesch readability — each with a hash-exact DuckDB oracle
twin.

Like the rest of the §2.11 tier these go beyond the reference's
surface toward what a large-scale training-data pipeline needs: a
100 TB corpus must leave the pipeline as BALANCED shards (stragglers
on skewed output files dominate write time), splits must hit their
quotas EXACTLY per stratum (a ±1-doc rounding drift per stratum is a
silent eval-set bias at 1e6 strata), retention triangles are the
product-analytics staple over the event log, and readability is a
classic cheap quality feature. Cross-engine exactness follows the
repo conventions: truncating integer division on non-negative
operands (``div`` / ``//``), DECIMAL(38)/HUGEINT widening where a
product can pass 2^63 (the sf1-soak cliff class), and every ranking
tie-broken by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import hashing

# ---------------------------------------------------------------------------
# corpus_shard_bytes — serpentine LPT output-shard balancing
# ---------------------------------------------------------------------------

#: output shard count for the balancing report
_N_SHARDS = 8


def q_corpus_shard_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output sharding: docs ranked by byte size descending
    (ties by doc_id) are dealt serpentine over N shards — rank k goes
    to shard k mod 2N folded back (0..N-1, N-1..0), the deterministic
    longest-processing-time-style heuristic that keeps every shard's
    byte total within one max-document of ideal. Output: per-shard
    doc count, byte total, and the ppm share of corpus bytes (ideal =
    1e6 / N). Scale shape: the global size rank is the two-pass
    range-stitch (no single-task window); everything after is one
    N-row aggregation. The share division runs widened — corpus byte
    totals pass 2^63 long before 100 TB."""
    from .operators.scalable_window import global_rank

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr(
            "doc_id", "octet_length(coalesce(text, '')) AS n_bytes"
        )
    )
    ranked = global_rank(
        docs, [F.desc("n_bytes"), F.asc("doc_id")], out_col="rk"
    )
    two_n = 2 * _N_SHARDS
    assigned = ranked.selectExpr(
        "n_bytes",
        f"CASE WHEN (rk - 1) % {two_n} < {_N_SHARDS}"
        f" THEN (rk - 1) % {two_n}"
        f" ELSE {two_n - 1} - (rk - 1) % {two_n} END AS shard",
    )
    total = assigned.agg(
        F.sum("n_bytes").cast("long").alias("total_bytes")
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
        )
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "cast(shard AS bigint) AS shard",
            "n_docs",
            "shard_bytes",
            hashing.wide_ppm_div_sql(1_000_000, "shard_bytes", "total_bytes")
            + " AS share_ppm",
        )
        .orderBy("shard")
    )


def _oracle_corpus_shard_bytes() -> str:
    two_n = 2 * _N_SHARDS
    share = hashing.duckdb_wide_ppm_div_sql(
        1_000_000, "shard_bytes", "total_bytes"
    )
    return f"""
WITH sb_docs AS (
  SELECT doc_id, strlen(COALESCE(text, '')) AS n_bytes FROM documents
),
sb_rk AS (
  SELECT n_bytes,
         ROW_NUMBER() OVER (ORDER BY n_bytes DESC, doc_id) AS rk
  FROM sb_docs
),
sb_as AS (
  SELECT n_bytes,
         CASE WHEN (rk - 1) % {two_n} < {_N_SHARDS}
              THEN (rk - 1) % {two_n}
              ELSE {two_n - 1} - (rk - 1) % {two_n} END AS shard
  FROM sb_rk
),
sb_t AS (SELECT SUM(n_bytes)::BIGINT AS total_bytes FROM sb_as),
sb_g AS (
  SELECT shard, COUNT(*)::BIGINT AS n_docs,
         SUM(n_bytes)::BIGINT AS shard_bytes
  FROM sb_as GROUP BY 1
)
SELECT shard::BIGINT AS shard, n_docs, shard_bytes, {share} AS share_ppm
FROM sb_g CROSS JOIN sb_t
ORDER BY shard
"""


# ---------------------------------------------------------------------------
# corpus_stratified_quota — largest-remainder split allocation
# ---------------------------------------------------------------------------

#: (index, split name, quota ppm) — must sum to exactly 1e6
_SPLITS = ((0, "train", 800_000), (1, "val", 100_000), (2, "test", 100_000))


def q_corpus_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified split allocation by the largest-remainder
    (Hamilton) method: per (lang, source) stratum of n docs, each
    split's base allocation is floor(n * quota_ppm / 1e6); the
    0, 1 or 2 leftover seats go to the splits with the LARGEST
    remainders (ties by split index), so every stratum's allocations
    sum to exactly n — the property hash-based splitting
    (corpus_split_assign) only achieves in expectation. Output: one
    row per stratum x split with the allocated count. Scale shape:
    strata are aggregates (one count shuffle over the corpus); the
    allocation itself runs on stratum-level rows — |strata| per
    corpus, millions at worst — with a stratum-partitioned window
    over exactly 3 rows each. Quota products run widened (n *
    800000 passes 2^63 at ~1.2e13 docs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    strata = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    splits_inline = ", ".join(
        f"named_struct('idx', {i}L, 'split', '{s}', 'p_ppm', {p}L)"
        for i, s, p in _SPLITS
    )
    exploded = strata.selectExpr(
        "lang", "source", "n", f"inline(array({splits_inline}))"
    ).selectExpr(
        "lang",
        "source",
        "n",
        "idx",
        "split",
        hashing.wide_ppm_div_sql("p_ppm", "n", "1000000") + " AS base",
        "CAST((CAST(p_ppm AS DECIMAL(38,0)) * n) % 1000000 AS BIGINT)"
        " AS rem",
    )
    w = Window.partitionBy("lang", "source")
    wo = w.orderBy(F.desc("rem"), F.asc("idx"))
    return (
        exploded.withColumn("leftover", F.col("n") - F.sum("base").over(w))
        .withColumn("rk", F.row_number().over(wo))
        .selectExpr(
            "lang",
            "source",
            "split",
            "n AS n_stratum",
            "base + (CASE WHEN rk <= leftover THEN 1L ELSE 0L END)"
            " AS alloc",
        )
        .orderBy("lang", "source", "split")
    )


def _oracle_corpus_stratified_quota() -> str:
    vals = ", ".join(f"({i}, '{s}', {p})" for i, s, p in _SPLITS)
    base = hashing.duckdb_wide_ppm_div_sql("p_ppm", "n", "1000000")
    return f"""
WITH sq_strata AS (
  SELECT lang, source, COUNT(*)::BIGINT AS n FROM documents GROUP BY 1, 2
),
sq_splits AS (SELECT * FROM (VALUES {vals}) t(idx, split, p_ppm)),
sq_x AS (
  SELECT lang, source, n, idx, split,
         {base} AS base,
         ((p_ppm::HUGEINT * n) % 1000000)::BIGINT AS rem
  FROM sq_strata CROSS JOIN sq_splits
),
sq_w AS (
  SELECT lang, source, n, idx, split, base,
         n - SUM(base) OVER (PARTITION BY lang, source) AS leftover,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY rem DESC, idx) AS rk
  FROM sq_x
)
SELECT lang, source, split, n AS n_stratum,
       (base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END))::BIGINT
         AS alloc
FROM sq_w
ORDER BY lang, source, split
"""


# ---------------------------------------------------------------------------
# events_retention_triangle — weekly cohort retention
# ---------------------------------------------------------------------------

#: microseconds per week
_WEEK_US = 7 * 86_400_000_000
#: longest offset reported (0 = the cohort week itself)
_RETENTION_MAX_OFFSET = 7


def q_events_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic cohort retention triangle: users grouped by
    first-activity week; each cell (cohort week, offset) counts users
    active offset weeks later, with the retention rate in ppm of the
    cohort size (offset 0 is 1e6 by construction — kept as the
    self-check row). Scale shape: one distinct over (user, week), one
    min-aggregation for cohorts, a user-keyed equi-join, one cell
    aggregation; cohort sizes are a weeks-sized broadcast. Counts
    stay far inside int64 (ppm * user-count wraps only past 9.2e12
    users), so the division is plain ``div``."""
    from .queries_registry import _read_events

    ev = _read_events(spark, sf_dir).selectExpr(
        "user_id", f"ts_us div {_WEEK_US} AS week"
    )
    return retention_triangle_from_user_weeks(ev.distinct())


def retention_triangle_from_user_weeks(user_week: DataFrame) -> DataFrame:
    """Triangle rollup over a distinct (user_id, week) activity
    relation — shared by the batch query and the streaming twin,
    whose mergeable state IS this relation (per-batch distinct
    partials, distinct-union merge; a late event that moves a user's
    first week re-derives every dependent cell because cohorts are
    recomputed from the merged state, not carried)."""
    cohorts = user_week.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        user_week.join(cohorts, "user_id")
        .selectExpr("cohort_week", "week - cohort_week AS offset_weeks")
        .filter(F.col("offset_weeks") <= _RETENTION_MAX_OFFSET)
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .selectExpr(
            "cast(cohort_week AS bigint) AS cohort_week",
            "cast(offset_weeks AS bigint) AS offset_weeks",
            "n_active",
            "cohort_size",
            "(1000000 * n_active) div cohort_size AS retained_ppm",
        )
        .orderBy("cohort_week", "offset_weeks")
    )


def _oracle_events_retention_triangle() -> str:
    return f"""
WITH rt_uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events
),
rt_c AS (
  SELECT user_id, MIN(week) AS cohort_week FROM rt_uw GROUP BY 1
),
rt_s AS (
  SELECT cohort_week, COUNT(*)::BIGINT AS cohort_size FROM rt_c GROUP BY 1
),
rt_cells AS (
  SELECT c.cohort_week, u.week - c.cohort_week AS offset_weeks,
         COUNT(*)::BIGINT AS n_active
  FROM rt_uw u JOIN rt_c c ON u.user_id = c.user_id
  WHERE u.week - c.cohort_week <= {_RETENTION_MAX_OFFSET}
  GROUP BY 1, 2
)
SELECT ce.cohort_week::BIGINT AS cohort_week,
       ce.offset_weeks::BIGINT AS offset_weeks,
       ce.n_active, s.cohort_size,
       ((1000000 * ce.n_active) // s.cohort_size)::BIGINT AS retained_ppm
FROM rt_cells ce JOIN rt_s s ON ce.cohort_week = s.cohort_week
ORDER BY cohort_week, offset_weeks
"""


# ---------------------------------------------------------------------------
# text_readability — integerized Flesch reading ease
# ---------------------------------------------------------------------------


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease (Flesch 1948) as an exact integer
    milli-score: FRE_milli = 206835 - (1015 * words) div sentences -
    (84600 * syllables) div words, with sentences = count of
    [.!?]+ runs (min 1) and syllables approximated as [aeiouy]+
    vowel runs over the lowercased text — the standard cheap
    proxy; the score is a staple quality feature next to the Gopher
    and CCNet gates. Map-only scan; per-document counts are bounded
    by document length so plain ``div`` is exact and safe. Docs with
    zero words are excluded (the formula is undefined)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from .functions.text import tokens

    return (
        docs.select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n_words"),
            F.expr(
                "greatest(cast(regexp_count(coalesce(text, ''),"
                " '[.!?]+') AS bigint), 1L)"
            ).alias("n_sentences"),
            F.expr(
                "cast(regexp_count(lower(coalesce(text, '')),"
                " '[aeiouy]+') AS bigint)"
            ).alias("n_syllables"),
        )
        .filter(F.col("n_words") > 0)
        .selectExpr(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syllables",
            "206835 - (1015 * n_words) div n_sentences"
            " - (84600 * n_syllables) div n_words AS fre_milli",
        )
        .orderBy("doc_id")
    )


def _oracle_text_readability() -> str:
    toks = hashing.duckdb_tokens_sql("text")
    return f"""
WITH rd AS (
  SELECT doc_id,
         len({toks})::BIGINT AS n_words,
         GREATEST(len(regexp_extract_all(COALESCE(text, ''),
                                         '[.!?]+'))::BIGINT, 1) AS n_sentences,
         len(regexp_extract_all(lower(COALESCE(text, '')),
                                '[aeiouy]+'))::BIGINT AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       (206835 - (1015 * n_words) // n_sentences
        - (84600 * n_syllables) // n_words)::BIGINT AS fre_milli
FROM rd WHERE n_words > 0
ORDER BY doc_id
"""


WAVE9_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_shard_bytes": q_corpus_shard_bytes,
    "corpus_stratified_quota": q_corpus_stratified_quota,
    "events_retention_triangle": q_events_retention_triangle,
    "text_readability": q_text_readability,
}

WAVE9_ORACLES: dict[str, str] = {
    "corpus_shard_bytes": _oracle_corpus_shard_bytes(),
    "corpus_stratified_quota": _oracle_corpus_stratified_quota(),
    "events_retention_triangle": _oracle_events_retention_triangle(),
    "text_readability": _oracle_text_readability(),
}


# ---------------------------------------------------------------------------
# orders_holt_winters — additive triple-exponential-smoothing forecast
# ---------------------------------------------------------------------------

#: smoothing rationals (num/10): alpha (level), beta (trend), gamma (seasonal)
_HW_ALPHA = 2
_HW_BETA = 1
_HW_GAMMA = 3
#: seasonal period (months) and forecast horizon
_HW_PERIOD = 12
_HW_HORIZON = 12


def _hw_tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — BOTH engine twins
    truncate (Spark ``div``, DuckDB ``//``); Python ``//`` floors, so
    the driver fold must not use it on negative trend/seasonal
    numerators."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def q_orders_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing, Winters
    1960) over monthly order revenue in exact integer cents:
    alpha=0.2 / beta=0.1 / gamma=0.3 as exact rationals with
    truncating division at every step, so both engines replay the
    identical recurrence bit for bit. Init is the textbook simple
    scheme (L0 = mean of season 1, B0 = (mean season 2 - mean season
    1)/12, S = first-season deviations); observations are the ordered
    PRESENT months (positional seasonality — a calendar gap shifts
    the queue identically in both twins). Output: the 12-month
    forecast L + h*B + S[h] with the month index it lands on.

    Scale shape: the only corpus-sized work is the monthly rollup
    (one shuffle); the recurrence is inherently sequential over the
    ~calendar-bounded month curve, so it folds on the collected
    ~80-row series (the KM/attribution bounded-collect tier — bounded
    by the time range, never the row count) while the DuckDB twin
    replays it as a recursive CTE carrying the 12-slot seasonal queue
    as list state. Monthly cents sums stay inside int64 to ~2e17
    cents/month (1e5x the sf1 soak's biggest month)."""
    monthly = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mid",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("mid")
        .agg(F.sum("cents").cast("long").alias("x"))
        .orderBy("mid")
    )
    rows = monthly.collect()  # calendar-bounded (~80 rows at any sf)
    m = _HW_PERIOD
    if len(rows) < 2 * m:
        return spark.createDataFrame(
            [], "h long, month_index long, forecast_cents long"
        )
    xs = [r["x"] for r in rows]
    l = _hw_tdiv(sum(xs[:m]), m)
    b = _hw_tdiv(sum(xs[m : 2 * m]) - sum(xs[:m]), m * m)
    s = [xs[i] - l for i in range(m)]
    for t in range(m, len(xs)):
        x = xs[t]
        sm = s[0]
        lp = l
        l = _hw_tdiv(_HW_ALPHA * (x - sm) + (10 - _HW_ALPHA) * (lp + b), 10)
        b = _hw_tdiv(_HW_BETA * (l - lp) + (10 - _HW_BETA) * b, 10)
        s = s[1:] + [_hw_tdiv(_HW_GAMMA * (x - l) + (10 - _HW_GAMMA) * sm, 10)]
    last_mid = rows[-1]["mid"]
    out = [
        (h, last_mid + h, l + h * b + s[(h - 1) % m])
        for h in range(1, _HW_HORIZON + 1)
    ]
    return spark.createDataFrame(
        out, "h long, month_index long, forecast_cents long"
    ).orderBy("h")


def _oracle_orders_holt_winters() -> str:
    m = _HW_PERIOD
    al, be, ga = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    return f"""
WITH RECURSIVE hw_m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mid,
         SUM(ROUND(o_totalprice * 100)::BIGINT)::BIGINT AS x
  FROM orders GROUP BY 1
),
hw_obs AS (
  SELECT ROW_NUMBER() OVER (ORDER BY mid) AS t, mid, x FROM hw_m
),
hw_n AS (SELECT COUNT(*)::BIGINT AS n, MAX(mid)::BIGINT AS last_mid
         FROM hw_obs),
hw_init AS (
  SELECT {m}::BIGINT AS t,
         list_sum(o.xs[1:{m}]) // {m} AS l,
         (list_sum(o.xs[{m + 1}:{2 * m}]) - list_sum(o.xs[1:{m}]))
           // {m * m} AS b,
         list_transform(o.xs[1:{m}],
             v -> v - list_sum(o.xs[1:{m}]) // {m}) AS s
  FROM (SELECT list(x ORDER BY t) AS xs FROM hw_obs) o
),
hw_run AS (
  SELECT t, l, b, s FROM hw_init
  UNION ALL
  SELECT o.t,
         ({al} * (o.x - r.s[1]) + {10 - al} * (r.l + r.b)) // 10,
         ({be} * (({al} * (o.x - r.s[1]) + {10 - al} * (r.l + r.b)) // 10
                  - r.l) + {10 - be} * r.b) // 10,
         r.s[2:{m}] || [({ga} * (o.x
             - ({al} * (o.x - r.s[1]) + {10 - al} * (r.l + r.b)) // 10)
             + {10 - ga} * r.s[1]) // 10]
  FROM hw_run r JOIN hw_obs o ON o.t = r.t + 1
),
hw_fin AS (
  -- the >= 2 seasons guard mirrors the Spark side's early return:
  -- with 12-23 months hw_init would still seed at t=12 and emit
  -- garbage forecasts the Spark twin never produces
  SELECT r.l, r.b, r.s FROM hw_run r CROSS JOIN hw_n
  WHERE r.t = hw_n.n AND hw_n.n >= {2 * m}
)
SELECT h::BIGINT AS h,
       (hw_n.last_mid + h)::BIGINT AS month_index,
       (f.l + h * f.b + f.s[((h - 1) % {m}) + 1])::BIGINT
         AS forecast_cents
FROM hw_fin f CROSS JOIN hw_n CROSS JOIN range(1, {_HW_HORIZON} + 1) r(h)
ORDER BY h
"""


WAVE9_QUERIES["orders_holt_winters"] = q_orders_holt_winters
WAVE9_ORACLES["orders_holt_winters"] = _oracle_orders_holt_winters()
