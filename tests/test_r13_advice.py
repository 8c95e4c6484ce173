"""Round-12 ADVICE regression pins.

Advice #3: q_dedup_recall_report's full-outer-join rewrite counts
n_exact / n_candidates correctly ONLY while both pair operators emit
each (id_a, id_b) pair exactly once — a duplicated pair on one side
would multiply the other side's matches through the join. Pin the
distinctness contract so a future staging rewrite cannot silently skew
the recall/precision ppm.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _max_pair_multiplicity(pairs) -> int:
    row = (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0]
    )
    return int(row[0]) if row[0] is not None else 0


def test_minhash_lsh_pairs_emits_distinct_pairs(spark, documents):
    from c99_vectordb_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(documents, id_col="doc_id", body_col="text")
    assert _max_pair_multiplicity(pairs) <= 1


def test_staged_jaccard_pairs_emits_distinct_pairs(spark, documents):
    from c99_vectordb_spark.operators.dedup import staged_jaccard_pairs
    from c99_vectordb_spark.queries_ext import JACCARD_THRESHOLD

    pairs = staged_jaccard_pairs(
        documents, id_col="doc_id", body_col="text",
        threshold=JACCARD_THRESHOLD,
    )
    assert _max_pair_multiplicity(pairs) <= 1
