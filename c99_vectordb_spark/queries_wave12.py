"""Wave-12 queries: the suffix-array exact-substring tier.

Judge r8 stretch #8: Lee et al. 2022 use suffix arrays where
``dedup_substring_spans`` uses hashed grams. ``dedup_suffix_array``
builds the suffix array of the (sliced) corpus by distributed prefix
doubling and reports the duplicated-gram ladder plus the exact
longest-duplicated-substring length — operators/suffix.py holds the
construction and the contract.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def q_dedup_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array exact-substring dedup report over documents.

    Rows (gram_len, n_dup, occ): for each ladder length 2^k the number
    of distinct duplicated token 2^k-grams and the positions they
    cover, plus the closing (0, max_lcp, pairs_at_max) row — the
    longest EXACTLY duplicated token substring in the sliced corpus
    and how many adjacent suffix pairs realize it. See
    operators/suffix.py for the scale argument (no global windows,
    log-n fully-partitioned doubling rounds)."""
    from .operators.suffix import suffix_ladder_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return suffix_ladder_report(docs, id_col="doc_id", body_col="text")


def _oracle_suffix_array() -> str:
    from .operators.suffix import duckdb_suffix_sql

    return duckdb_suffix_sql("SELECT doc_id AS doc, text AS body FROM documents")


def q_decontaminate_exact_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact cross-corpus contamination over documents: eval suite =
    doc_id % 23 == 0 (decontaminate_eval's split), train = the rest.
    Rows (gram_len, n_cross, eval_docs_hit) per ladder length plus the
    closing (0, max_shared_len, n_cross_grams_at_max) row — the
    longest token substring shared between eval and train, exactly.
    See operators/suffix.py cross_overlap_report for the construction
    and the order-free vs order-dependent twin argument."""
    from .operators.suffix import cross_overlap_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cross_overlap_report(
        docs, id_col="doc_id", body_col="text", eval_pred="doc_id % 23 = 0"
    )


def _oracle_cross_overlap() -> str:
    from .operators.suffix import duckdb_cross_sql

    return duckdb_cross_sql(
        "SELECT doc_id AS doc, text AS body FROM documents", "doc % 23 = 0"
    )


def q_decontaminate_span_scrub(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact contamination span scrubbing over documents (eval =
    doc_id % 23 == 0): every train-doc token covered by a full
    16-token window that also occurs in an eval doc is removed;
    output per affected train doc = (id, n_tokens, n_removed,
    clean_fp) with the cleaned token stream hash-pinned via the
    migrate md5-56 convention. operators/suffix.cross_scrub_report."""
    from .operators.suffix import cross_scrub_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cross_scrub_report(
        docs, id_col="doc_id", body_col="text", eval_pred="doc_id % 23 = 0"
    )


def _oracle_span_scrub() -> str:
    from .operators.suffix import duckdb_scrub_sql

    return duckdb_scrub_sql(
        "SELECT doc_id AS doc, text AS body FROM documents", "doc % 23 = 0"
    )


def q_decontaminate_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental exact-substring contamination (judge r9 ask #4 —
    the daily-ingest shape of the wave-12 exact tier): the STANDING
    corpus (doc_id % 7 != 3) builds its prefix-doubling index once;
    today's BATCH (doc_id % 7 == 3) is relabeled through the standing
    maps by a pure inner-join cascade and reported exactly — rows
    (gram_len, n_cross, batch_docs_hit) per ladder length plus the
    closing (0, max_shared_len, n_cross_at_max) row. The DuckDB twin
    recomputes the whole report from scratch over the UNION with the
    batch as the tagged side, deliberately ignorant of the incremental
    structure (operators/suffix_inc.py holds the equivalence
    argument and the fullness invariant)."""
    from .operators.suffix_inc import (
        incremental_cross_report,
        release_suffix_index,
        standing_suffix_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = standing_suffix_index(
        docs.filter("doc_id % 7 != 3"), id_col="doc_id", body_col="text"
    )
    out = incremental_cross_report(
        docs.filter("doc_id % 7 = 3"), index, id_col="doc_id",
        body_col="text",
    )
    # the report is local; this query owns its index — free it now
    release_suffix_index(index)
    return out


def _oracle_incremental() -> str:
    from .operators.suffix import duckdb_cross_sql

    return duckdb_cross_sql(
        "SELECT doc_id AS doc, text AS body FROM documents",
        "doc % 7 = 3",
        hit_col="batch_docs_hit",
    )


WAVE12_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_suffix_array": q_dedup_suffix_array,
    "decontaminate_exact_overlap": q_decontaminate_exact_overlap,
    "decontaminate_span_scrub": q_decontaminate_span_scrub,
    "decontaminate_incremental": q_decontaminate_incremental,
}

WAVE12_ORACLES: dict[str, str] = {
    "dedup_suffix_array": _oracle_suffix_array(),
    "decontaminate_exact_overlap": _oracle_cross_overlap(),
    "decontaminate_span_scrub": _oracle_span_scrub(),
    "decontaminate_incremental": _oracle_incremental(),
}
