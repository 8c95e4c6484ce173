"""Deterministic, mergeable sketches: Count-Min and KMV distinct.

Classic approximate aggregates (heavy hitters, distinct counts) whose
engine built-ins (`approx_count_distinct` HLL, datasketches) are
implementation-specific and therefore un-oracle-able. These two are
built on the repo's fixed polynomial hash spec (hashing.py), so every
cell of the sketch — and every estimate derived from it — is an exact
integer reproducible in Spark, DuckDB, and Python. Approximation
error comes from the DESIGN (width/depth, k), not from randomness:
the estimates are deterministic and the oracle hash-checks them.

Scale shape (both sketches):
- build = one partial-aggregating shuffle whose key domain is the
  sketch size (d x w cells / k values per group), not the data size;
- sketches MERGE (CMS cells add; KMV unions then re-truncates), so
  per-partition partials combine exactly like any Spark aggregate —
  the same property datasketches relies on, with none of the
  engine-specific state.

Row-hash family for CMS: row j maps a token hash h to column
(h*(2j+3) + 7j+1) mod HASH_MOD mod width — the affine-per-row mixing
proven non-degenerate for SimHash (hashing.simhash_signature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..hashing import HASH_MOD
from ..functions.text import token_hash, tokens

CMS_DEPTH = 4
CMS_WIDTH = 1024
KMV_K = 64
#: multiplicative finalizer (Knuth) applied after token_hash in KMV:
#: the polynomial hash of SHORT strings is small (31^len bounded), so
#: raw k-th minima are tiny and the estimator explodes; one modular
#: multiply spreads any input domain across [0, HASH_MOD).
KMV_MIX_A = 2654435761


def _cms_col(h: Column, j: int, width: int) -> Column:
    return ((h * (2 * j + 3) + 7 * j + 1) % HASH_MOD) % width


def cms_build(
    df: DataFrame,
    body_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch of the corpus token stream: (j, col, n) cells.
    Explode tokens, hash once, derive the d row columns, aggregate —
    the shuffle key domain is d*width cells. Two sketches over
    different corpus shards merge by adding cells."""
    # ONE corpus scan: hash each token once, explode its d (j, col)
    # cells MAP-SIDE, aggregate once. The earlier unionByName-of-d-
    # branches re-executed the scan + tokenize + char-fold hash d times
    # (round-5 review finding). A single aggregation (not a pre-
    # aggregate on h) keeps the operator a valid STREAMING aggregate —
    # chained groupBys are unsupported under readStream; partial
    # aggregation still collapses the shuffle to d*width cells per
    # partition.
    tok = df.select(F.explode(tokens(F.col(body_col))).alias("tok"))
    th = tok.select(token_hash(F.col("tok")).alias("h"))
    cells = th.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_col(F.col("h"), j, width).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("s")
    )
    return (
        cells.select("s.j", "s.col")
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch: for each probe token, the CMS estimate
    min_j cell[j][col_j(token)] (>= the true count, deterministic).
    The probe side derives its d (j, col) keys and equi-joins the
    sketch — sketch cells broadcast (d*width rows)."""
    h = token_hash(F.col(probe_col))
    keyed = probes.select(
        F.col(probe_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_col(h, j, width).alias("col")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("s"),
    ).select(probe_col, "s.j", "s.col")
    return (
        keyed.join(F.broadcast(sketch), ["j", "col"], "left")
        .groupBy(probe_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cms_est"))
    )


def duckdb_cms_cell_sql(h_expr: str, j: int, width: int = CMS_WIDTH) -> str:
    return f"((({h_expr}) * {2 * j + 3} + {7 * j + 1}) % {HASH_MOD}) % {width}"


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """KMV (k minimum values) distinct-count estimate per group:
    hash each distinct value, keep the k smallest distinct hashes;
    if the group has >= k distinct values the estimate is
    floor((k-1) * HASH_MOD / h_k), else the exact count. All integer
    arithmetic on the shared hash spec — deterministic cross-engine.

    At scale the per-group state is k hashes (mergeable: union two
    groups' hash sets, re-take the k smallest); here the top-k per
    group is a window over distinct (group, hash) pairs — one
    group-keyed shuffle."""
    hashed = df.select(
        F.col(group_col).alias("grp"),
        (
            (token_hash(F.col(value_col).cast("string")) * F.lit(KMV_MIX_A))
            % F.lit(HASH_MOD)
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    per_grp = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
    )
    est = F.when(
        F.col("h_k").isNotNull(),
        F.floor(F.lit((k - 1) * HASH_MOD) / F.col("h_k")).cast("long"),
    ).otherwise(F.col("n_distinct"))
    return per_grp.select("grp", "n_distinct", est.alias("kmv_est"))


def bottomk_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 256,
    qs: tuple[int, ...] = (25, 50, 75),
) -> DataFrame:
    """Approximate per-group quantiles from a DETERMINISTIC bottom-k
    hash sample — the quantile-sketch counterpart of kmv_distinct.

    Membership: the k rows whose mixed id-hash is smallest form a
    uniform-without-replacement sample whose composition depends only
    on the data (no rand(), no seed) — so the estimate is an exact
    integer the DuckDB twin reproduces, and approximation error comes
    from k alone. Quantile rule over the sorted sample (v asc):
    element at row floor(q*(n-1)/100) + 1, the lower-nearest-rank
    convention in both engines.

    Scale shape: the sample IS mergeable (union partials, re-take k
    smallest hashes — same merge as KMV), so a production aggregate
    implements it as a partial top-k without materializing either
    window; this expression form keeps the algebra oracle-checkable.
    State/shuffle is k rows per group, independent of group size.
    Ties: the hash orders (h, v, id) totally, value ranks (v, h)
    totally — both engines agree on every boundary.
    """
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        (
            (token_hash(F.col(id_col).cast("string")) * F.lit(KMV_MIX_A))
            % F.lit(HASH_MOD)
        ).alias("h"),
    )
    wh = Window.partitionBy("grp").orderBy("h", "v")
    sample = (
        hashed.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    wv = Window.partitionBy("grp").orderBy("v", "h")
    ranked = sample.withColumn("rv", F.row_number().over(wv))
    n_s = ranked.groupBy("grp").agg(F.count(F.lit(1)).alias("n_sample"))
    picks = [
        F.max(
            F.when(
                F.col("rv")
                == F.floor(F.lit(q) * (F.col("n_sample") - 1) / 100).cast("int")
                + 1,
                F.col("v"),
            )
        ).alias(f"p{q}")
        for q in qs
    ]
    totals = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_total")
    )
    return (
        ranked.join(n_s, "grp")
        .groupBy("grp")
        .agg(F.max("n_sample").alias("n_sample"), *picks)
        .join(totals, "grp")
        .select("grp", "n_total", "n_sample", *[f"p{q}" for q in qs])
    )
