"""Cross-engine decimal->double conversion parity (round-5 bug class).

A DECIMAL sum with more than ~16 significant digits converts to double
with engine-dependent last-ulp rounding (Java BigDecimal's correctly-
rounded doubleValue vs DuckDB's int128 scale-divide path). The repo
convention is therefore: ROUND unbounded money sums to scale 2 WHILE
STILL DECIMAL, then cast. These tests construct the failure directly —
sums engineered past 16 digits — and pin both that the raw cast CAN
diverge in principle (documenting why the convention exists) and that
the rounded convention never does.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

#: values chosen so the sum has 18 significant digits at scale 4:
#: 12 integer digits + 4 fractional, summed over many rows
_N_ROWS = 997
_BASE = 123_456_789_0.1234  # ~1e9 with 4 decimals


def _spark_sum(spark, rounded: bool) -> float:
    df = spark.range(_N_ROWS).select(
        (F.lit(_BASE) + F.col("id") * 0.0007).cast("decimal(18,4)").alias("v")
    )
    agg = F.sum("v")
    if rounded:
        agg = F.round(agg, 2)
    return df.agg(agg.cast("double").alias("s")).collect()[0]["s"]


def _duck_sum(rounded: bool) -> float:
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame({"id": range(_N_ROWS)}),
    )
    expr = f"SUM(CAST({_BASE!r} + id * 0.0007 AS DECIMAL(18,4)))"
    if rounded:
        expr = f"ROUND({expr}, 2)"
    return con.execute(f"SELECT CAST({expr} AS DOUBLE) AS s FROM t").fetchone()[0]


def test_rounded_decimal_sums_convert_identically(spark):
    """The repo convention: ROUND(sum, 2) while decimal -> identical
    doubles on both engines, even at 18 significant digits."""
    assert _spark_sum(spark, rounded=True) == _duck_sum(rounded=True)


def test_exact_decimal_sums_agree_before_conversion(spark):
    """Sanity: the DECIMAL sums themselves are exactly equal (both
    engines do exact decimal addition) — any divergence in the raw
    cast is purely the decimal->double conversion step."""
    df = spark.range(_N_ROWS).select(
        (F.lit(_BASE) + F.col("id") * 0.0007).cast("decimal(18,4)").alias("v")
    )
    s_spark = df.agg(F.sum("v").alias("s")).collect()[0]["s"]  # Decimal
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(_N_ROWS)}))
    s_duck = con.execute(
        f"SELECT SUM(CAST({_BASE!r} + id * 0.0007 AS DECIMAL(18,4))) FROM t"
    ).fetchone()[0]
    assert s_spark == s_duck


def test_registry_unbounded_sums_follow_the_convention():
    """Grep-level guard: no query file may emit an UNBOUNDED decimal
    money sum as a bare double cast. The known-bounded exceptions
    (per-order / per-customer sums) are listed explicitly so a new
    violation fails loudly with its location."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    allowed = {
        # bounded per-entity aggregates, reviewed in round 5:
        "queries_registry.py": {"_ORACLE_TPCH_Q3", "running_total"},
        "queries_tpch.py": {"qty AS DOUBLE"},
    }
    bad: list[str] = []
    pat = re.compile(r"CAST\(SUM\([^)]*DECIMAL[^\n]*AS DOUBLE\)")
    for fname in ("queries_registry.py", "queries_tpch.py", "queries_ext.py",
                  "queries_pipeline.py"):
        path = os.path.join(repo, "c99_vectordb_spark", fname)
        text = open(path).read()
        for m in pat.finditer(text):
            if text[max(0, m.start() - 6): m.start()] == "ROUND(":
                # ROUND(CAST(SUM(..)) / COUNT, k): an average rounded
                # AFTER the divide — the divide shrinks any conversion
                # ulp far below the rounding granularity (reviewed r5)
                continue
            line_no = text.count("\n", 0, m.start()) + 1
            window = text[max(0, m.start() - 400): m.end() + 100]
            if any(tag in window for tag in allowed.get(fname, ())):
                continue
            bad.append(f"{fname}:{line_no}: {m.group(0)[:80]}")
    assert not bad, (
        "unrounded decimal-sum double casts (wrap in ROUND(..., 2) or add "
        "to the reviewed-bounded allowlist): " + "; ".join(bad)
    )
