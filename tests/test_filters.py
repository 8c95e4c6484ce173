"""F1-F10 filter-compiler parity.

The strongest check available: the reference's filter evaluation is
pure Python, so we load /root/reference/memo_cli.py (with a stubbed
``faiss`` module — never installed here) and compare its
``matches_filter`` verdicts against the compiled Spark predicate on
identical metadata, row by row. No reference code is copied; it is
*executed* as the behavioral oracle.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.model import RECORDS_SCHEMA
from c99_vectordb_spark.operators import filters as Flt
from c99_vectordb_spark.sources.convert import record_row


@pytest.fixture(scope="module")
def reference():
    if "faiss" not in sys.modules:
        fake = types.ModuleType("faiss")
        fake.METRIC_L2 = 1
        sys.modules["faiss"] = fake
    spec = importlib.util.spec_from_file_location(
        "memo_cli_ref", "/root/reference/memo_cli.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["memo_cli_ref"] = mod  # dataclasses need the module registered
    spec.loader.exec_module(mod)
    return mod


METADATAS = [
    None,
    {},
    {"source": "user", "priority": 3, "category": "personal"},
    {"source": "chat", "priority": "2", "category": "pref_ui"},
    {"source": "system", "priority": 10, "tags": ["food", "personal"]},
    {"source": "user", "tags": [], "flag": True},
    {"source": "user", "tags": ["ops"], "flag": False},
    {"priority": 2.5, "category": "prefix_test"},
    {"category": "pref", "ts": "2026-02-21T10:00:00Z"},
    {"category": "health", "nested": {"a": 1}},
    {"priority": 0, "source": "User"},
    {"a.b": "x", "weird key": 2},  # non-identifier keys (variant path quoting)
]

FILTERS = [
    "source: user",
    "source: USER",
    "priority: 3",
    "priority: '3'",
    "tags: personal",
    "tags: ops",
    "flag: true",
    "priority: {$gte: 2}",
    "priority: {$gte: '2'}",
    "priority: {$lte: 2.5}",
    "category: {$prefix: pref}",
    "priority: {$prefix: '2'}",
    "tags: {$contains: food}",
    "category: {$contains: pref}",
    "source: {$ne: user}",
    "tags: {$ne: food}",
    "missing: {$ne: x}",
    # NOTE: the un-braced form "source: user, priority: {$gte: 2}" crashes
    # the reference's parse_yaml_flow_map (ScannerError) — braces are only
    # "optional" when the bare string happens to be valid YAML. Our
    # parse_filter_expr retries with braces (strict superset).
    "{source: user, priority: {$gte: 2}}",
    "$and: [{source: user}, {priority: {$gte: 2}}]",
    "$or: [{source: chat}, {category: health}]",
    "$or: [{$and: [{source: user}, {flag: true}]}, {category: {$prefix: pre}}]",
    # $gte/$lte on a LIST value compares python str(list) (memo_cli.py:186)
    "tags: {$gte: '2'}",
    "tags: {$lte: zzz}",
    "tags: {$gte: 5}",
    "tags: {$lte: '['}",
    "a.b: x",
    "weird key: {$gte: 1}",
    "source: {$unknown: x}",
    "nested: \"{'a': 1}\"",
    "$and: notalist",
    "$or: notalist",
]


@pytest.fixture(scope="module")
def records_df(spark):
    rows = [record_row(i, f"body {i}", md) for i, md in enumerate(METADATAS)]
    return spark.createDataFrame(rows, RECORDS_SCHEMA).cache()


def _reference_verdicts(reference, filt_str):
    parsed = reference.parse_yaml_flow_map(filt_str)
    # call sites guard empty/missing metadata BEFORE matches_filter
    # (memo_cli.py:501-506, 668-674)
    return {
        i: bool(md) and reference.matches_filter(md, parsed)
        for i, md in enumerate(METADATAS)
    }


@pytest.mark.parametrize("filt", FILTERS)
def test_parity_with_reference(spark, records_df, reference, filt):
    expected = _reference_verdicts(reference, filt)
    col = Flt.compile_filter(
        filt, Flt.map_resolver(), nonempty=Flt.records_nonempty_metadata()
    )
    got_ids = {r.id for r in records_df.filter(col).select("id").collect()}
    want_ids = {i for i, ok in expected.items() if ok}
    assert got_ids == want_ids, f"filter {filt!r}: spark={got_ids} ref={want_ids}"


def test_empty_filter_matches_only_nonempty_metadata(spark, records_df, reference):
    col = Flt.compile_filter(
        {}, Flt.map_resolver(), nonempty=Flt.records_nonempty_metadata()
    )
    got = {r.id for r in records_df.filter(col).select("id").collect()}
    # reference: empty filter dict -> matches iff record has metadata
    want = {
        i
        for i, md in enumerate(METADATAS)
        if bool(md) and reference.matches_filter(md, {})
    }
    assert got == want


def test_unbraced_multikey_fallback(spark, records_df):
    """Our parser accepts the un-braced multi-key form the reference
    documents but crashes on (SKILL.md:184-190 vs ScannerError)."""
    parsed = Flt.parse_filter_expr("source: user, priority: {$gte: 2}")
    assert parsed == {"source": "user", "priority": {"$gte": 2}}


def test_condition_with_two_ops_never_matches(spark, records_df):
    col = Flt.compile_filter(
        {"priority": {"$gte": 1, "$lte": 5}},
        Flt.map_resolver(),
        nonempty=Flt.records_nonempty_metadata(),
    )
    assert records_df.filter(col).count() == 0


def test_columns_resolver_on_typed_table(spark):
    df = spark.createDataFrame(
        [(1, "user", 3, ["a", "b"]), (2, "chat", None, []), (3, "User", 7, None)],
        "id INT, source STRING, priority INT, tags ARRAY<STRING>",
    )
    res = Flt.columns_resolver(df)
    assert {r.id for r in df.filter(Flt.compile_filter("source: user", res)).collect()} == {1}
    # NULL priority treated as absent key: $ne must not match id=2
    assert {
        r.id for r in df.filter(Flt.compile_filter("priority: {$ne: 3}", res)).collect()
    } == {3}
    assert {
        r.id for r in df.filter(Flt.compile_filter("tags: {$contains: a}", res)).collect()
    } == {1}
    assert {
        r.id for r in df.filter(Flt.compile_filter("tags: b", res)).collect()
    } == {1}
    # numeric vs lexicographic dual path
    assert {
        r.id for r in df.filter(Flt.compile_filter("priority: {$gte: 5}", res)).collect()
    } == {3}


# ---------------------------------------------------------------------------
# VariantType metadata path (SURVEY §1.5) — same language, same compiler,
# Spark 4 VARIANT column instead of the MAP triple
# ---------------------------------------------------------------------------

# python-repr of nested-map metadata ("{'a': 1}") is not reproducible
# from a JSON-roundtripped variant ('{"a":1}') without a UDF — the one
# documented divergence of the variant layout (COVERAGE.md §1.5).
_VARIANT_SKIP = {"nested: \"{'a': 1}\""}


@pytest.fixture(scope="module")
def variant_df(spark):
    import json

    rows = [
        (i, json.dumps(md) if md is not None else None)
        for i, md in enumerate(METADATAS)
    ]
    df = spark.createDataFrame(rows, "id LONG, j STRING")
    return df.select("id", F.parse_json("j").alias("metadata_v")).cache()


@pytest.mark.parametrize("filt", [f for f in FILTERS if f not in _VARIANT_SKIP])
def test_variant_resolver_parity_with_reference(spark, variant_df, reference, filt):
    expected = _reference_verdicts(reference, filt)
    col = Flt.compile_filter(
        filt, Flt.variant_resolver(), nonempty=Flt.variant_nonempty_metadata()
    )
    got_ids = {r.id for r in variant_df.filter(col).select("id").collect()}
    want_ids = {i for i, ok in expected.items() if ok}
    assert got_ids == want_ids, f"filter {filt!r}: spark={got_ids} ref={want_ids}"


def test_variant_and_map_resolvers_agree(spark, records_df, variant_df):
    """Both layouts must give identical verdicts for every filter in
    the suite (minus the documented repr divergence)."""
    for filt in FILTERS:
        if filt in _VARIANT_SKIP:
            continue
        m = Flt.compile_filter(
            filt, Flt.map_resolver(), nonempty=Flt.records_nonempty_metadata()
        )
        v = Flt.compile_filter(
            filt, Flt.variant_resolver(), nonempty=Flt.variant_nonempty_metadata()
        )
        map_ids = {r.id for r in records_df.filter(m).select("id").collect()}
        var_ids = {r.id for r in variant_df.filter(v).select("id").collect()}
        assert map_ids == var_ids, filt
