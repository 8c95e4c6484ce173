"""Every registry query must emit only scalar (driver-canonicalizable)
columns.

The driver's correctness gate canonicalizes a query's output with a
pandas sort over ALL columns before hashing; an ARRAY / MAP / STRUCT
cell is unhashable there and crashes the row (round-5's one red row:
``corpus_postings`` with ``postings ARRAY<BIGINT>`` died with
``unhashable type: 'list'`` even though its values were correct).
The local gate used to tuple-ize lists — masking exactly this — so
this guard enforces the DRIVER's stricter contract at the schema
level: building each query's (lazy) plan and rejecting any complex
output type.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _complex_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields if isinstance(f.dataType, COMPLEX)]


def test_no_query_outputs_complex_types(spark, sf_dir):
    import __spark_entry__ as entry

    offenders: dict[str, list[str]] = {}
    for name, fn in entry.queries().items():
        try:
            schema = fn(spark, sf_dir).schema  # lazy — plan only, no execution
        except Exception as exc:  # noqa: BLE001 — schema-buildability is
            # its own failure; report it rather than masking with a skip
            offenders[name] = [f"<plan build failed: {type(exc).__name__}: {exc}>"]
            continue
        bad = _complex_cols(schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries() entries with driver-unhashable (array/map/struct) output "
        f"columns: {offenders}"
    )


def test_guard_catches_a_deliberately_arrayed_fixture(spark):
    """Prove the guard actually fires on the round-5 failure shape."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id"), F.array(F.lit(1), F.lit(2)).alias("postings")
    )
    assert _complex_cols(df.schema) == ["postings"]
    with pytest.raises(AssertionError):
        assert not _complex_cols(df.schema)
