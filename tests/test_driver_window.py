"""The driver's correctness gate checks the FIRST 50 queries() entries.

DRIVER_WINDOW pins that prefix so every operator family gets an
independent driver-verified row each round (round-3 verdict: half the
registry had only local verification because the window filled up with
redundant filter/stats variants). These tests keep the pin honest
without starting Spark.
"""

from __future__ import annotations

FAMILIES = {
    "core": {"recall_topk_int", "filter_orders_page", "stats_topk_other",
             "compaction_reseq", "upsert_docs"},
    "tpch": {"tpch_q1", "tpch_q5", "tpch_q21"},
    "joins": {"salted_join_revenue", "range_join_bands", "asof_join_events",
              "semi_anti_joins"},
    "windows": {"orders_scd2", "events_trailing_24h", "skyline_orders",
                "price_histogram"},
    "streaming_twin": {"events_sessions"},
    "approx": {"approx_distinct_kmv", "sketch_heavy_hitters"},
    "udtf": {"udtf_shingles", "grouped_rank"},
    "dedup": {"dedup_minhash_pairs", "dedup_survivors"},
    "similarity": {"sim_lsh_bucketed", "sim_ivf_batch", "sim_pq_fixed",
                   "sim_ivfpq_fixed"},
    "multimodal": {"multimodal_meta_roundtrip", "multimodal_png_roundtrip"},
    "text": {"text_quality", "text_langid", "text_fingerprint"},
    "corpus": {"corpus_pipeline", "corpus_tfidf_terms", "corpus_split_assign"},
}


def test_window_is_first_50_and_complete():
    import __spark_entry__ as entry
    from c99_vectordb_spark.queries_registry import DRIVER_WINDOW

    names = list(entry.queries())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == DRIVER_WINDOW
    assert len(names) == len(set(names))


def test_window_covers_every_family():
    from c99_vectordb_spark.queries_registry import DRIVER_WINDOW

    window = set(DRIVER_WINDOW)
    for family, reps in FAMILIES.items():
        assert reps & window == reps, f"family {family}: missing {reps - window}"


def test_window_oracle_coverage():
    """Every window entry except the documented rows-only ones must
    carry an exact DuckDB oracle."""
    import __spark_entry__ as entry
    from c99_vectordb_spark.queries_registry import DRIVER_WINDOW

    oracles = entry.oracle_sql()
    rows_only = {"multimodal_features"}  # COVERAGE.md: no closed SQL form
    missing = [n for n in DRIVER_WINDOW if n not in oracles and n not in rows_only]
    assert not missing, f"window entries without oracle: {missing}"
