"""Round-8 wave: OLAP grouping sets, Merkle-bucket snapshot
reconciliation, and rendezvous (HRW) sharding.

Three operator families the registry lacked:

- ``orders_grouping_sets`` — the classic OLAP subtotal surface
  (ROLLUP): one pass produces leaf rows, per-year subtotals, and the
  grand total, each tagged with its grouping level. Spark plans this
  as a single Expand + one aggregation (no self-union of three
  groupBys), the same shape DuckDB executes — the canonical
  "let the engine do it" cube operator.
- ``docs_merkle_diff`` — replication-style snapshot reconciliation:
  hash-bucket both corpus versions, per-bucket XOR checksum over
  row-content hashes, compare. At 100 TB the follow-up transfer
  touches only DIRTY buckets (the Merkle/anti-entropy argument, e.g.
  Dynamo-style replica sync); XOR is order-independent and
  overflow-free, so the checksum is exact on both engines with no
  widening ladder.
- ``corpus_rendezvous_shards`` — highest-random-weight (HRW/
  rendezvous, Thaler & Ravishankar 1998) shard assignment: every doc
  goes to argmax over shards of md5(doc:shard). Adding a shard moves
  only the keys whose new-shard hash wins (~1/(S+1) of the corpus) —
  the placement property consistent hashing is used for; the query
  reports per-shard occupancy and exactly which share moved when the
  shard count grows 8 -> 9, complementing the LPT serpentine packer
  (corpus_shard_bytes), which balances but reshuffles everything.

All integer/exact: cents sums, counts, md5-56 hashes (positional-use
rule -> md5, hashing.duckdb_md5_hash56_sql twin), XOR folds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import hashing
from .queries_wave7 import _spark_md5_56

# ---------------------------------------------------------------------------
# orders_grouping_sets — ROLLUP(year, priority) revenue cube
# ---------------------------------------------------------------------------


def q_orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue cube over ROLLUP(year, order priority): leaf rows +
    per-year subtotals + grand total in ONE aggregation pass (Spark's
    Expand operator replicates each input row once per grouping set
    before a single hash aggregate — no three-way self-union, no
    re-scan per level). lvl = grouping bit mask (0 leaf, 1 year
    subtotal, 3 grand total); the rollup NULLs are sentinel-coalesced
    (-1 / 'ALL') because the driver's canonicalizer and the source
    data both dislike NULL keys — unambiguous here since neither
    column is nullable in the data."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cube = (
        orders.selectExpr(
            "year(o_orderdate) AS yr",
            "o_orderpriority AS priority",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .rollup("yr", "priority")
        .agg(
            F.expr("grouping_id()").cast("long").alias("lvl"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    return cube.selectExpr(
        "coalesce(yr, -1) AS yr",
        "coalesce(priority, 'ALL') AS priority",
        "lvl",
        "n_orders",
        "revenue_cents",
    ).orderBy("lvl", "yr", "priority")


_ORACLE_GROUPING_SETS = """
SELECT COALESCE(year(o_orderdate), -1)::BIGINT AS yr,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       GROUPING(year(o_orderdate), o_orderpriority)::BIGINT AS lvl,
       COUNT(*)::BIGINT AS n_orders,
       SUM(ROUND(o_totalprice * 100)::BIGINT)::BIGINT AS revenue_cents
FROM orders
GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
ORDER BY lvl, yr, priority
"""


# ---------------------------------------------------------------------------
# docs_merkle_diff — bucket-checksum snapshot reconciliation
# ---------------------------------------------------------------------------

_MERKLE_BUCKETS = 16


def _merkle_rows(docs: DataFrame, new: bool) -> DataFrame:
    """One snapshot side's (bucket, h) row projection, reusing
    corpus_snapshot_diff's derivation (old = doc_id % 5 != 0; new =
    doc_id % 3 != 0 with every 7th text 'edited' to its 40-char
    prefix) so the two reconciliation operators audit the same
    synthetic change set. Row hash binds id AND content; bucket is
    keyed on the id hash alone so an edited row dirties exactly one
    bucket on each side. Shared by the batch aggregation below and
    the streaming twin's test (streaming/stateful.
    streaming_merkle_summary), so stream and batch provably fold the
    same rows."""
    if new:
        side = docs.filter(F.col("doc_id") % 3 != 0).selectExpr(
            "doc_id",
            "CASE WHEN doc_id % 7 = 0 THEN substring(text, 1, 40) "
            "ELSE text END AS text",
        )
    else:
        side = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text")
    h_id = _spark_md5_56("cast(doc_id AS string)")
    h_row = _spark_md5_56("concat(cast(doc_id AS string), ':', text)")
    return side.selectExpr(
        f"pmod({h_id}, {_MERKLE_BUCKETS}) AS bucket", f"{h_row} AS h"
    )


def _merkle_side(docs: DataFrame, new: bool) -> DataFrame:
    return _merkle_rows(docs, new).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("bit_xor(h)").cast("long").alias("x"),
    )


def q_docs_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-bucket reconciliation between two corpus snapshots: each
    side folds to _MERKLE_BUCKETS (bucket, row count, XOR-of-row-
    hashes) rows; a bucket whose (n, x) pair matches is provably
    transfer-skippable up to hash collision, and only dirty buckets
    need row-level diffing (the anti-entropy protocol's first round).
    100 TB story: each side is ONE map-side-combinable aggregation to
    a constant-size summary — the row-level join of the full
    corpora (corpus_snapshot_diff) runs only on the dirty slice,
    here reported as dirty=1 rows. XOR is commutative/associative and
    never overflows, so no DECIMAL widening is needed at any scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = _merkle_side(docs, new=False)
    new = _merkle_side(docs, new=True)
    o = old.selectExpr("bucket", "n AS n_old", "x AS xor_old")
    n = new.selectExpr("bucket", "n AS n_new", "x AS xor_new")
    return (
        o.join(n, "bucket", "full_outer")
        .selectExpr(
            "bucket",
            "coalesce(n_old, 0L) AS n_old",
            "coalesce(n_new, 0L) AS n_new",
            "coalesce(xor_old, 0L) AS xor_old",
            "coalesce(xor_new, 0L) AS xor_new",
        )
        .selectExpr(
            "*",
            "CAST(n_old != n_new OR xor_old != xor_new AS BIGINT) AS dirty",
        )
        .orderBy("bucket")
    )


def _oracle_merkle_diff() -> str:
    h_id = hashing.duckdb_md5_hash56_sql("doc_id::VARCHAR")
    h_old = hashing.duckdb_md5_hash56_sql("concat(doc_id::VARCHAR, ':', text)")
    h_new = hashing.duckdb_md5_hash56_sql(
        "concat(doc_id::VARCHAR, ':', "
        "CASE WHEN doc_id % 7 = 0 THEN substring(text, 1, 40) ELSE text END)"
    )
    b = _MERKLE_BUCKETS
    return f"""
WITH mk_old AS (
  SELECT ({h_id}) % {b} AS bucket, COUNT(*)::BIGINT AS n_old,
         bit_xor({h_old})::BIGINT AS xor_old
  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
),
mk_new AS (
  SELECT ({h_id}) % {b} AS bucket, COUNT(*)::BIGINT AS n_new,
         bit_xor({h_new})::BIGINT AS xor_new
  FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1
)
SELECT COALESCE(o.bucket, n.bucket) AS bucket,
       COALESCE(n_old, 0)::BIGINT AS n_old,
       COALESCE(n_new, 0)::BIGINT AS n_new,
       COALESCE(xor_old, 0)::BIGINT AS xor_old,
       COALESCE(xor_new, 0)::BIGINT AS xor_new,
       (COALESCE(n_old, 0) != COALESCE(n_new, 0)
        OR COALESCE(xor_old, 0) != COALESCE(xor_new, 0))::BIGINT AS dirty
FROM mk_old o FULL OUTER JOIN mk_new n ON o.bucket = n.bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# corpus_rendezvous_shards — HRW placement + growth movement
# ---------------------------------------------------------------------------

_HRW_SHARDS = 8  #: current shard count; the query grows it by one


def q_corpus_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous/HRW sharding: doc -> argmax over shards of
    md5(doc_id:shard) (ties, practically impossible, break to the
    lower shard id). The defining property — growing S -> S+1 moves
    ONLY the docs whose new shard's hash beats all old ones, an
    expected 1/(S+1) of the corpus, with no coordinator state — is
    reported directly: per new-shard occupancy (docs, chars) plus how
    many docs moved in from the old assignment. Complements the LPT
    packer (corpus_shard_bytes), which balances bytes perfectly but
    reassigns arbitrarily on every change.

    Scale shape: one explode to S+1 rows per doc, two doc-keyed
    ranked windows over the SAME exploded projection (Spark runs them
    in one Window node pair on one sort), then a corpus-sized
    groupBy. No joins, no driver state."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = _HRW_SHARDS
    h = _spark_md5_56("concat(cast(doc_id AS string), ':', cast(shard AS string))")
    exploded = docs.selectExpr(
        "doc_id", "n_chars", f"explode(sequence(0, {s1})) AS shard"
    ).selectExpr("doc_id", "n_chars", "shard", f"{h} AS h")
    w_new = Window.partitionBy("doc_id").orderBy(F.desc("h"), F.asc("shard"))
    # the S-shard winner ranks within shards < s1 only; the S+1 winner
    # over all — same frame, one extra conditional rank column
    w_old = Window.partitionBy("doc_id").orderBy(
        F.expr(f"CASE WHEN shard < {s1} THEN -h ELSE NULL END").asc_nulls_last(),
        F.asc("shard"),
    )
    ranked = exploded.select(
        "doc_id",
        "n_chars",
        "shard",
        F.row_number().over(w_new).alias("rk_new"),
        F.row_number().over(w_old).alias("rk_old"),
    )
    assign = (
        ranked.groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("rk_new") == 1, F.col("shard"))).alias("shard_new"),
            F.max(F.when(F.col("rk_old") == 1, F.col("shard"))).alias("shard_old"),
            F.max("n_chars").alias("n_chars"),
        )
    )
    return (
        assign.groupBy(F.col("shard_new").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(
                (F.col("shard_old") != F.col("shard_new")).cast("long")
            ).alias("n_moved"),
        )
        .orderBy("shard")
    )


def _oracle_rendezvous() -> str:
    s1 = _HRW_SHARDS
    h = hashing.duckdb_md5_hash56_sql(
        "concat(doc_id::VARCHAR, ':', shard::VARCHAR)"
    )
    return f"""
WITH rv_e AS (
  SELECT doc_id, n_chars, u.shard::BIGINT AS shard, ({h}) AS h
  FROM documents, unnest(range(0, {s1 + 1})) AS u(shard)
),
rv_r AS (
  SELECT doc_id, n_chars, shard,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY h DESC, shard ASC) AS rk_new,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY (CASE WHEN shard < {s1} THEN -h
                                      ELSE NULL END) ASC NULLS LAST,
                            shard ASC) AS rk_old
  FROM rv_e
),
rv_a AS (
  SELECT doc_id,
         MAX(CASE WHEN rk_new = 1 THEN shard END) AS shard_new,
         MAX(CASE WHEN rk_old = 1 THEN shard END) AS shard_old,
         MAX(n_chars) AS n_chars
  FROM rv_r GROUP BY doc_id
)
SELECT shard_new AS shard, COUNT(*)::BIGINT AS n_docs,
       SUM(n_chars)::BIGINT AS sum_chars,
       SUM((shard_old != shard_new)::BIGINT)::BIGINT AS n_moved
FROM rv_a GROUP BY 1 ORDER BY shard
"""


WAVE10_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "orders_grouping_sets": q_orders_grouping_sets,
    "docs_merkle_diff": q_docs_merkle_diff,
    "corpus_rendezvous_shards": q_corpus_rendezvous_shards,
}

WAVE10_ORACLES: dict[str, str] = {
    "orders_grouping_sets": _ORACLE_GROUPING_SETS,
    "docs_merkle_diff": _oracle_merkle_diff(),
    "corpus_rendezvous_shards": _oracle_rendezvous(),
}
