"""Fuzzy string matching: q-gram-blocked edit-distance similarity join.

Entity resolution's core primitive — match dirty strings against a
clean catalog under an edit-distance threshold WITHOUT the all-pairs
cross product. Candidate generation is an equi-join on shared q-grams
with a count filter (strings within edit distance d share most of
their q-grams: each edit destroys at most q grams, so truly-close
pairs co-occur on many gram keys); only candidates pay the exact
``levenshtein`` verify. Both Spark and DuckDB ship the identical
classic dynamic-programming levenshtein, so the verified output is
exact cross-engine.

The count filter here runs on DISTINCT q-grams — the standard
blocking heuristic (the textbook multiset bound
|common| >= L_max - q + 1 - d*q assumes positional multisets; the
distinct-set variant can in principle under-count a gram repeated on
both sides). The DuckDB oracle replays the IDENTICAL blocking, so the
report is exact; blocking recall on real data is a design property,
not an engine divergence.

100 TB shape: grams explode each side ~L rows per string, the join is
a plain equi-join on the gram key (shuffle keyed by gram — skewed
ultra-common grams can be capped exactly like shingles in dedup), and
the quadratic levenshtein runs only on blocked candidates. No
CartesianProduct exists in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: gram size / max verified edit distance (design constants shared
#: with the oracle twin)
FUZZY_Q = 2
FUZZY_D = 2


def qgram_rows(df: DataFrame, name_col: str, carry: tuple[str, ...] = ()) -> DataFrame:
    """Explode a string column to its DISTINCT positional q-grams:
    (carry..., name_col, gram). len(s)-q+1 grams per string."""
    return (
        df.select(
            *carry,
            name_col,
            F.explode(
                F.expr(f"sequence(1, greatest(length({name_col}) - {FUZZY_Q - 1}, 1))")
            ).alias("_i"),
        )
        .select(
            *carry, name_col, F.expr(f"substring({name_col}, _i, {FUZZY_Q})").alias("gram")
        )
        .distinct()
    )


def gram_blocked_matches(
    dirty: DataFrame,
    clean: DataFrame,
    key_col: str = "dirty_key",
    dirty_col: str = "dirty_name",
    clean_col: str = "match_name",
    d: int = FUZZY_D,
) -> DataFrame:
    """Similarity join dirty (key, name) x clean (name) under edit
    distance <= d. Returns (key_col, dirty_col, clean_col, lev) for
    every verified candidate pair.

    Plan: gram-explode both sides -> equi-join on gram -> per-pair
    shared-gram count filter (>= L_max - (q-1) - d*q, floored at 1)
    -> exact levenshtein verify. The clean side's gram table is the
    small one here (catalog-sized) — Catalyst broadcasts it; with two
    corpus-sized sides the same plan is a shuffle equi-join on gram.
    """
    q = FUZZY_Q
    dg = qgram_rows(dirty, dirty_col, carry=(key_col,))
    cg = qgram_rows(clean, clean_col)
    thr = F.greatest(
        F.greatest(F.length(dirty_col), F.length(clean_col))
        - F.lit(q - 1)
        - F.lit(d * q),
        F.lit(1),
    )
    cand = (
        dg.join(cg, "gram")
        .groupBy(key_col, dirty_col, clean_col)
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .filter(F.col("shared_grams") >= thr)
    )
    return (
        cand.withColumn(
            "lev", F.levenshtein(F.col(dirty_col), F.col(clean_col)).cast("long")
        )
        .filter(F.col("lev") <= d)
        .select(key_col, dirty_col, clean_col, "lev")
    )


def corrupt_name(name: Column, h: Column) -> Column:
    """Deterministic single-character deletion keyed by a hash of the
    string — the dirty-twin generator for the fuzzy-join fixture (the
    same hash-keyed-determinism convention as corpus_snapshot_diff's
    edits: no rand(), both engines derive the identical corruption).
    Deletes the character at 1-based position (h mod len) + 1."""
    delpos = (h % F.length(name)) + F.lit(1)
    return F.concat(
        F.substring(name, F.lit(1), delpos - F.lit(1)),
        F.substring(name, delpos + F.lit(1), F.length(name)),
    )
