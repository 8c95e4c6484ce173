"""Schema-drift smoke test.

The driver owns the testdata and may change parquet physical types
between rounds (round 2 casualty: events.ts flipped from
TIMESTAMP(NANOS) to native micros TIMESTAMP and broke five
previously-green queries at ANALYSIS time). This test forces Catalyst
analysis of EVERY registered query against the current testdata —
``df.schema`` resolves the full plan without executing it — so that
class of breakage surfaces here in seconds instead of in the driver's
correctness gate.

Queries whose *construction* already runs Spark jobs (ANN index
training) still only have their final plan analyzed, not executed.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

_QUERY_NAMES = sorted(entrymod.queries().keys())


def test_registry_is_nonempty():
    assert len(_QUERY_NAMES) >= 80


@pytest.mark.parametrize("name", _QUERY_NAMES)
def test_query_analyzes_against_current_testdata(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    schema = df.schema  # forces analysis, no execution
    assert len(schema.fields) > 0, f"{name}: empty schema"


def test_oracle_keys_are_subset_of_queries():
    """Every oracle_sql() key must name a registered query (a stray key
    would silently drop a correctness row at the driver)."""
    qs = set(entrymod.queries())
    extra = set(entrymod.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys without queries: {sorted(extra)}"
