"""Round-8 second wave: prefix-filtered exact similarity join.

- ``dedup_prefix_pairs`` — the AllPairs/PPJoin tier
  (operators/dedup.prefix_filter_jaccard_pairs): EXACT uncapped
  Jaccard >= t pairs where the candidate join touches only each
  document's rarest-shingle prefix. The registry's other near-dup
  tiers trade something for scale — ngram_jaccard_pairs caps shingle
  frequency (changes semantics), MinHash-LSH accepts probabilistic
  recall, the staged tier needs exact duplicates to collapse. Prefix
  filtering is the fourth point in that design space: exact
  semantics, no cap, and the join fan-out is bounded because the
  global rarest-first order pushes boilerplate shingles out of every
  prefix. Oracle: the UNCAPPED all-pairs SQL — a hash match proves
  the filtered plan computes the identical relation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .queries_ext import _duck_hl_cte

#: PPJoin threshold — higher than the capped tier's 0.2 (the classic
#: setting; the prefix shortens as t grows, so t is the cost knob)
PREFIX_JACCARD_THRESHOLD = 0.5


def q_dedup_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged form since the r8 sf1 soak: exact-collapse first (263 s
    -> seconds on the 90%-dup corpus), PPJoin on unique texts, exact
    expansion. Oracle unchanged — the naive uncapped all-pairs SQL;
    the hash match proves the staged prefix plan computes the
    identical relation. The plain prefix join stays callable as the
    fixture-test reference (tests/test_wave11.py asserts staged ==
    naive == uncapped-all-pairs)."""
    from .operators.dedup import prefix_filter_jaccard_pairs_staged

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return prefix_filter_jaccard_pairs_staged(
        docs, id_col="doc_id", body_col="text",
        threshold=PREFIX_JACCARD_THRESHOLD,
    )


# UNCAPPED all-pairs Jaccard — deliberately the naive relation: the
# prefix filter is a pure execution strategy, so the oracle must not
# know it exists. (DuckDB runs the small-SF all-pairs join in ~1 s at
# sf0.1; the Spark plan never materializes it at any scale.)
_ORACLE_PREFIX_PAIRS = f"""
WITH {_duck_hl_cte()},
pp_sizes AS (SELECT doc_id, COUNT(*)::BIGINT AS sz FROM sh GROUP BY 1),
pp_shared AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*)::BIGINT AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM pp_shared
JOIN pp_sizes sa ON ia = sa.doc_id
JOIN pp_sizes sb ON ib = sb.doc_id
WHERE inter * 1000000 >=
      {round(PREFIX_JACCARD_THRESHOLD * 1_000_000)} * (sa.sz + sb.sz - inter)
"""


# ---------------------------------------------------------------------------
# sim_dbscan_clusters — density clustering (DBSCAN) over simhash codes
# ---------------------------------------------------------------------------

_DBSCAN_EPS = 3  #: Hamming radius over 60-bit simhash signatures
_DBSCAN_MIN_PTS = 3  #: |N_eps(p)| >= 3 (point counts itself) => core


def q_sim_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import dbscan_simhash_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dbscan_simhash_clusters(
        docs, id_col="doc_id", body_col="text",
        eps=_DBSCAN_EPS, min_pts=_DBSCAN_MIN_PTS,
    )


def _oracle_dbscan() -> str:
    from .queries_ext import _SIMS_CTE

    return f"""
WITH RECURSIVE {_SIMS_CTE},
db_p AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sims a JOIN sims b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sim, b.sim)) <= {_DBSCAN_EPS}
),
db_sym AS (SELECT ia AS s, ib AS d FROM db_p
           UNION ALL SELECT ib, ia FROM db_p),
db_core AS (
  SELECT s AS id FROM db_sym GROUP BY s
  HAVING COUNT(*) + 1 >= {_DBSCAN_MIN_PTS}
),
db_ce AS (
  SELECT s, d FROM db_sym
  WHERE s IN (SELECT id FROM db_core) AND d IN (SELECT id FROM db_core)
),
db_walk(id, comp) AS (
  SELECT DISTINCT s, s FROM db_ce
  UNION
  SELECT e.d, w.comp FROM db_walk w JOIN db_ce e ON e.s = w.id
),
db_comp AS (SELECT id, MIN(comp) AS cl FROM db_walk GROUP BY id),
db_corec AS (
  SELECT c.id, COALESCE(p.cl, c.id) AS cluster
  FROM db_core c LEFT JOIN db_comp p ON c.id = p.id
),
db_border AS (
  SELECT s.s AS id, MIN(cc.cluster) AS cluster
  FROM db_sym s JOIN db_corec cc ON s.d = cc.id
  WHERE s.s NOT IN (SELECT id FROM db_core)
  GROUP BY 1
)
SELECT d.doc_id AS id,
       CASE WHEN c.id IS NOT NULL THEN 'core'
            WHEN b.id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       COALESCE(c.cluster, b.cluster, -1)::BIGINT AS cluster
FROM documents d
LEFT JOIN db_corec c ON d.doc_id = c.id
LEFT JOIN db_border b ON d.doc_id = b.id
ORDER BY id
"""


WAVE11_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_prefix_pairs": q_dedup_prefix_pairs,
    "sim_dbscan_clusters": q_sim_dbscan_clusters,
}

WAVE11_ORACLES: dict[str, str] = {
    "dedup_prefix_pairs": _ORACLE_PREFIX_PAIRS,
    "sim_dbscan_clusters": _oracle_dbscan(),
}
