"""Hypothesis property tests for the session-5 primitives — laws on
ARBITRARY inputs the parquet fixtures cannot explore (negative epochs,
unicode-ish keys, extreme lengths). Pure-Python + DuckDB only (no
Spark session): fast enough for wide example counts.
"""
from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from c99_vectordb_spark.hashing import (
    duckdb_floor_div_sql,
    duckdb_md5_hash56_sql,
    token_hash,
    token_hash2,
)

# printable ASCII without the quote character (SQL literal safety —
# the production paths feed COLUMNS, not literals)
_KEY = st.text(
    st.characters(min_codepoint=32, max_codepoint=126),
    max_size=24,
)


@settings(max_examples=200, deadline=None)
@given(_KEY)
def test_duckdb_md5_hash56_matches_python(s):
    """The fast (md5_number_upper + byteswap) DuckDB fold == the
    Python/Spark definition int(md5(s).hexdigest()[:14], 16) for any
    input — the uniform-hash contract HLL and the bootstrap rest on."""
    # standard-SQL literal (single quotes doubled; backslash is a
    # plain character in DuckDB strings — Python repr() is NOT a SQL
    # literal, which this test's first draft learned the hard way)
    lit = "'" + s.replace("'", "''") + "'"
    got = duckdb.sql(f"SELECT {duckdb_md5_hash56_sql(lit)}").fetchone()[0]
    assert got == int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


@settings(max_examples=200, deadline=None)
@given(st.integers(-(2**62), 2**62), st.integers(1, 10**12))
def test_duckdb_floor_div_is_python_floor(n, d):
    """duckdb_floor_div_sql == Python // for any sign — the bucketing
    law bare `//` breaks on negatives (DuckDB truncates)."""
    got = duckdb.sql(
        f"SELECT {duckdb_floor_div_sql(f'({n}::BIGINT)', d)}"
    ).fetchone()[0]
    assert got == n // d


@settings(max_examples=200, deadline=None)
@given(_KEY)
def test_bloom_positions_in_range_and_deterministic(s):
    from c99_vectordb_spark.operators.sketches import BLOOM_K, BLOOM_M

    h1, h2 = token_hash_py(s), token_hash2(s)
    ps = [(h1 + i * h2) % BLOOM_M for i in range(BLOOM_K)]
    assert all(0 <= p < BLOOM_M for p in ps)
    assert ps == [(h1 + i * h2) % BLOOM_M for i in range(BLOOM_K)]


def token_hash_py(s):
    return token_hash(s)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(1, 23), min_size=0, max_size=256))
def test_hll_estimate_py_laws(rhos):
    """Estimator laws on arbitrary register states: positive, finite,
    monotone in total rank mass (raising any register never lowers the
    raw estimate), and the LC tier engages exactly per the cutoff."""
    from c99_vectordb_spark.operators.sketches import (
        HLL_LC_CUTOFF,
        HLL_M,
        hll_estimate_py,
    )

    rhos = rhos[:HLL_M]
    est = hll_estimate_py(rhos)
    # the EMPTY register set estimates 0 distinct (LC: m*ln(m/m)) —
    # the correct answer, not a degenerate one
    assert est >= 0
    assert (est == 0) == (len(rhos) == 0)
    if rhos and len(rhos) < HLL_M:
        bumped = sorted(rhos)
        bumped[0] = min(bumped[0] + 1, 23)
        est2 = hll_estimate_py(bumped)
        # raising a rank shrinks S; raw estimate rises. If either side
        # switched estimation tier the comparison is between different
        # formulas, so only assert when both used the same tier.
        zeros = HLL_M - len(rhos)

        def tier(vals):
            s = sum(2.0 ** -int(r) for r in vals) + (HLL_M - len(vals))
            from c99_vectordb_spark.operators.sketches import HLL_ALPHA_M2

            raw = HLL_ALPHA_M2 / s
            return "lc" if (HLL_M - len(vals)) > 0 and raw <= HLL_LC_CUTOFF else "raw"

        if tier(rhos) == tier(bumped) == "raw":
            assert est2 >= est


@settings(max_examples=150, deadline=None)
@given(st.text(st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=40))
def test_corrupt_name_python_model(s):
    """The dirty-twin deletion position is always in range for any
    printable string (hash mod length + 1), and deleting it yields a
    string one shorter at edit distance exactly 1... unless the
    deleted char repeats adjacently, where distance is still 1 by the
    deletion itself (levenshtein <= 1 and lengths differ => == 1)."""
    h = token_hash(s)
    pos = (h % len(s)) + 1
    assert 1 <= pos <= len(s)
    dirty = s[: pos - 1] + s[pos:]
    assert len(dirty) == len(s) - 1
