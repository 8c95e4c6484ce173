"""Upgrade the zorder_skipping SIMULATION to a real-parquet proof:
write `part` under both layouts (range-partitioned into multiple files,
sorted within), read the ACTUAL parquet footer min/max statistics with
pyarrow, and prune the three report predicates against them. The
simulated verdicts and the real footers must agree on the story:
z-order prunes files for BOTH dimensions, a single-column sort only
for its own."""
from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

N_FILES = 8


def _footer_stats(path: str) -> list[dict]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {"p_partkey": None, "p_size": None}
        hi = {"p_partkey": None, "p_size": None}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in lo and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        out.append({"min_pk": lo["p_partkey"], "max_pk": hi["p_partkey"],
                    "min_sz": lo["p_size"], "max_sz": hi["p_size"]})
    return out


def _scanned(stats: list[dict], pk: bool, sz: bool) -> int:
    n = 0
    for s in stats:
        ok = True
        if pk:
            ok = ok and s["max_pk"] >= 100 and s["min_pk"] <= 199
        if sz:
            ok = ok and s["max_sz"] >= 10 and s["min_sz"] <= 12
        n += ok
    return n


def test_real_parquet_footers_prune_like_the_report(spark, sf_dir):
    from c99_vectordb_spark.queries_ext import _ZORDER_BITS, zorder_col

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    mask = (1 << _ZORDER_BITS) - 1
    x = F.col("p_partkey").bitwiseAND(F.lit(mask))
    y = (F.col("p_size").cast("long") * F.lit(16)).bitwiseAND(F.lit(mask))
    base = part.select(
        "p_partkey", F.col("p_size").cast("int").alias("p_size"),
        zorder_col(x, y).alias("zval"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        zdir = os.path.join(tmp, "z")
        pdir = os.path.join(tmp, "p")
        (
            base.repartitionByRange(N_FILES, "zval", "p_partkey")
            .sortWithinPartitions("zval", "p_partkey")
            .write.parquet(zdir)
        )
        (
            base.repartitionByRange(N_FILES, "p_partkey")
            .sortWithinPartitions("p_partkey")
            .write.parquet(pdir)
        )
        zs = _footer_stats(zdir)
        ps = _footer_stats(pdir)
        assert len(zs) == N_FILES and len(ps) == N_FILES

        # single-column sort: near-optimal on its own column (the
        # matching rows span ceil(match/rows-per-file) contiguous
        # files, +1 for a boundary straddle), blind on the other
        n_rows = part.count()
        n_match = part.filter(
            (F.col("p_partkey") >= 100) & (F.col("p_partkey") <= 199)
        ).count()
        per_file = max(1, n_rows // N_FILES)
        optimal = -(-n_match // per_file)  # ceil
        assert _scanned(ps, pk=True, sz=False) <= optimal + 1
        assert _scanned(ps, pk=False, sz=True) == N_FILES
        # z-order: REAL footer pruning on the dimension the
        # single-column sort is blind to (pk pruning additionally
        # appears once the key space outgrows the predicate — at
        # sf0.001 the [100,199] slice is half of 200 keys, so every
        # z-file legitimately intersects it; zorder_skipping's sf0.01
        # oracle covers that regime)
        assert _scanned(zs, pk=False, sz=True) < N_FILES
        assert _scanned(zs, pk=False, sz=True) < _scanned(ps, pk=False, sz=True)
        # conjunction never reads more than either single predicate
        assert _scanned(zs, pk=True, sz=True) <= min(
            _scanned(zs, pk=True, sz=False), _scanned(zs, pk=False, sz=True)
        )
