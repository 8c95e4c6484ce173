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


# ---------------------------------------------------------------------------
# HyperLogLog (deterministic, fully oracled)
# ---------------------------------------------------------------------------

#: HLL register count (p = 8). Std error ~ 1.04/sqrt(m) = 6.5%.
HLL_M = 256
#: value bit-width after the register split: token_hash < HASH_MOD
#: < 2^30, so h div 256 < 2^22 — rho ranges over [1, HLL_W+1].
HLL_W = 22
#: alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3) — folded with
#: m^2 into ONE double literal so both engines perform the identical
#: single IEEE division alpha*m^2 / S.
HLL_ALPHA_M2 = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M


def hll_registers(df: DataFrame, key: Column, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """HyperLogLog register table (group_cols..., reg, rho) over a key
    column — rho = max leading-zero rank per register.

    The engine's own `approx_count_distinct` IS an HLL but its hash is
    implementation-private, so its registers can't be oracle-checked;
    this one runs on md5 (present and bit-identical in Spark, DuckDB,
    and Python), making every register — and the estimate — an exact
    integer both engines reproduce. The repo's polynomial fold is NOT
    usable here: short keys never wrap the modulus, so their values
    cluster tiny and the leading-zero ranks explode (first cut of this
    operator estimated 11668 for 1500 true distinct — a 7.8x blowout).
    HLL consumes hash bits POSITIONALLY (rho = leading-zero rank), so
    it needs avalanche uniformity, not just low collision rate —
    md5's first 14 hex chars fold to a uniform 56-bit integer
    (Spark: conv(substring(md5(k),1,14),16,10); DuckDB: strpos fold;
    exact parity test in tests). Register index = h mod m; rank
    rho = (leading zeros of the next HLL_W bits) + 1, computed with
    pure integer arithmetic (bit_length via length(bin(w)) — no float
    log2, whose libm ulps differ cross-engine at exact powers of two).

    Scale shape: ONE partial-aggregating shuffle keyed by (group, reg)
    — at most m rows of state per group regardless of input size, and
    max() makes the registers mergeable exactly like the engine's own
    HLL partials (hll_merge_law test unions disjoint halves).
    """
    return (
        hll_decompose(df, key, group_cols)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_decompose(
    df: DataFrame, key: Column, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The map-side, stateless half of hll_registers: one (group_cols
    ..., reg, rho) row per input row. Shared with the streaming twin
    (streaming/stateful.streaming_hll_distinct), whose state update is
    the same slot-wise max the batch groupBy performs."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 14), 16, 10).cast("long")
    base = df.select(*group_cols, h.alias("h")).selectExpr(
        *group_cols,
        f"h % {HLL_M} AS reg",
        f"(h div {HLL_M}) % {1 << HLL_W} AS w",
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W + 1) - F.length(F.bin(F.col("w"))))
        .cast("long")
    )
    return base.withColumn("rho", rho).drop("h", "w")


#: linear-counting coefficient m*ln(2) folded into ONE literal so both
#: engines multiply/divide identical doubles
HLL_LC_COEF = HLL_M * 0.6931471805599453
#: small-range switch threshold (Flajolet et al.: use LC when the raw
#: estimate <= 2.5m and empty registers remain)
HLL_LC_CUTOFF = 2.5 * HLL_M


def hll_estimate(regs: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """HLL estimate per group from a register table, with the standard
    small-range correction:

    - raw:  E = alpha*m^2 / (zeros + sum 2^-rho). Every 2^-rho term
      and every partial sum is an exact binary fraction (multiples of
      2^-(W+1) totalling < m), so the double sum is associativity-safe
      — the one division lands bit-identically in Spark and DuckDB.
    - linear counting (zeros V > 0 and raw <= 2.5m): E = m*ln(m/V).
      ln comes from the repo's INTEGERIZED piecewise-linear log2 (the
      BM25-idf construction: msb via bit length + linear fraction in
      q10) times a single m*ln2 literal — no libm ln(), whose ulps
      differ cross-engine.

    Output: (group_cols..., nonzero_regs, zero_regs, est_hll, method).
    """
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("nonzero_regs"),
        F.sum(
            F.expr("1.0 / cast(shiftleft(1L, cast(rho AS int)) AS double)")
        ).alias("s_nonzero"),
    )
    zeros = (F.lit(HLL_M) - F.col("nonzero_regs")).cast("long")
    raw = F.lit(HLL_ALPHA_M2) / (F.col("s_nonzero") + zeros.cast("double"))
    # R_q20 = (m * 2^20) div V ; log2(R/2^20) piecewise-linear in q10
    r_q20 = F.expr(f"({HLL_M << 20}) div greatest({HLL_M} - nonzero_regs, 1L)")
    step = agg.select(
        *group_cols,
        "nonzero_regs",
        zeros.alias("zero_regs"),
        raw.alias("raw_est"),
        r_q20.alias("r_q20"),
    )
    # the SHARED integerized piecewise log2 (operators.corpus
    # _plog2_cols — one source for the q10 log2 discipline; the DuckDB
    # twin is hashing.duckdb_plog2_sql)
    from .corpus import _plog2_cols

    log2_q10 = F.expr(_plog2_cols("r_q20"))
    lc = F.lit(HLL_LC_COEF) * log2_q10.cast("double") / F.lit(1024.0)
    use_lc = (F.col("zero_regs") > 0) & (F.col("raw_est") <= F.lit(HLL_LC_CUTOFF))
    return step.select(
        *group_cols,
        "nonzero_regs",
        "zero_regs",
        F.round(F.when(use_lc, lc).otherwise(F.col("raw_est")), 2).alias("est_hll"),
        F.when(use_lc, F.lit("linear_counting"))
        .otherwise(F.lit("raw"))
        .alias("method"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter runtime semi-join (deterministic, fully oracled)
# ---------------------------------------------------------------------------

#: Bloom bit-space and probe count (Kirsch-Mitzenmacher double
#: hashing: bit_i = (h1 + i*h2) mod m). m is a fixed design constant
#: shared with the oracle; the report MEASURES the resulting fp rate.
BLOOM_M = 65536
BLOOM_K = 2


def _bloom_positions(key_str: Column) -> Column:
    """Array of BLOOM_K bit positions for one key (double hashing on
    the two independent polynomial folds)."""
    from ..functions.text import string_hash, string_hash2

    h1 = string_hash(key_str)
    h2 = string_hash2(key_str)
    return F.array(
        *[(h1 + F.lit(i) * h2) % F.lit(BLOOM_M) for i in range(BLOOM_K)]
    )


def bloom_bits(df: DataFrame, key: Column) -> DataFrame:
    """Build side of a Bloom runtime filter: the distinct set bit
    positions (<= BLOOM_M rows — broadcastable no matter how large the
    build table is). This is the relational form of the bitmap Spark's
    own runtime row-group filters / DPP push below the scan: small
    derived state from the dim side pre-filters the fact scan."""
    return (
        df.select(key.cast("string").alias("k"))
        .distinct()
        .select(F.explode(_bloom_positions(F.col("k"))).alias("bit"))
        .distinct()
    )


def distinct_keys(df: DataFrame, key: Column) -> DataFrame:
    """Canonical (k string) distinct key set for the Bloom ops — build
    it ONCE per side; the probe and the exact-comparison branches
    share it (re-deriving it inside each consumer costs a fact-table
    scan + distinct shuffle per use — review finding)."""
    return df.select(key.cast("string").alias("k")).distinct()


def bloom_pass_keys(keys: DataFrame, bits: DataFrame) -> DataFrame:
    """Probe side: keys (a ``distinct_keys`` frame) whose BLOOM_K
    positions are ALL set. One broadcast equi-join on bit position +
    a key-keyed count — no bitmap datatype needed, so the plan stays
    declarative and the oracle can replay it. Output: passing keys."""
    pos = keys.select("k", F.explode(_bloom_positions(F.col("k"))).alias("bit"))
    return (
        pos.join(F.broadcast(bits), "bit")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nhit"))
        .filter(F.col("nhit") == BLOOM_K)
        .select("k")
    )


def hll_estimate_py(rhos: dict[int, int] | list[int]) -> float:
    """Pure-Python reference of hll_estimate's per-group math — shared
    by the streaming twin (which computes estimates driver-side from
    its register state) and tests. Bit-identical to the Spark/DuckDB
    expression: the sum is exact binary fractions, the LC tier uses
    the same integer piecewise log2, and rounding replays Spark's
    BigDecimal HALF_UP (Python's builtin round is banker's)."""
    from decimal import ROUND_HALF_UP, Decimal

    vals = list(rhos.values()) if isinstance(rhos, dict) else list(rhos)
    nonzero = len(vals)
    zeros = HLL_M - nonzero
    s = sum(2.0 ** -int(r) for r in vals) + float(zeros)
    raw = HLL_ALPHA_M2 / s
    if zeros > 0 and raw <= HLL_LC_CUTOFF:
        r_q20 = (HLL_M << 20) // max(zeros, 1)
        msb = r_q20.bit_length() - 1
        log2_q10 = (msb - 20) * 1024 + ((r_q20 - (1 << msb)) * 1024) // (1 << msb)
        est = HLL_LC_COEF * float(log2_q10) / 1024.0
    else:
        est = raw
    return float(Decimal(repr(est)).quantize(Decimal("0.01"), ROUND_HALF_UP))
