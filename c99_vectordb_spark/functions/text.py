"""Column-level text building blocks shared across operators.

These are pure Spark SQL expressions (JVM-side, whole-stage-codegen
eligible — no Python in the hot path) mirroring the reference's text
handling (/root/reference/memo_cli.py:138-143,160).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..model import HASH_BASE, HASH_MOD

TOKEN_PATTERN = "[a-z0-9_]+"


def normalize_ws(c: Column) -> Column:
    """Collapse whitespace runs to single spaces, strip (memo_cli.py:138-139)."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def is_blank(c: Column) -> Column:
    """Whitespace-only / empty body test (memo_cli.py:142-143)."""
    return normalize_ws(F.coalesce(c, F.lit(""))) == F.lit("")


def tokens(c: Column) -> Column:
    """Lowercased ``[a-z0-9_]+`` token array (memo_cli.py:160)."""
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def token_hash(tok: Column) -> Column:
    """Stable polynomial rolling hash of one token (hashing.py spec).

    Pure fold over characters; exact-integer parity with the Python and
    DuckDB implementations.
    """
    chars = F.filter(F.split(tok, ""), lambda ch: ch != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, ch: (h * F.lit(HASH_BASE) + F.ascii(ch)) % F.lit(HASH_MOD),
    )


def string_hash(c: Column) -> Column:
    """token_hash applied to an arbitrary string column (fingerprints)."""
    return token_hash(c)


def ts_from_nanos(c: Column) -> Column:
    """TIMESTAMP from a BIGINT-nanos column (events.ts is parquet
    TIMESTAMP(NANOS), which the session reads as long — session.py)."""
    return F.timestamp_micros((c / F.lit(1000)).cast("long"))
