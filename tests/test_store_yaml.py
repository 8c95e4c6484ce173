"""Parquet store (S3/S4/S6) and YAML adapter (S1/S2/S5) semantics."""

from __future__ import annotations

import os

import pytest

from c99_vectordb_spark.model import RECORDS_SCHEMA
from c99_vectordb_spark.sources import yaml_io
from c99_vectordb_spark.sources.convert import record_row
from c99_vectordb_spark.sources.store import ParquetStore


def _records(spark, rows):
    return spark.createDataFrame(
        [record_row(*r) for r in rows], RECORDS_SCHEMA
    )


def test_store_roundtrip_and_swap(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "db"))
    assert not store.exists()
    assert store.load_records().count() == 0  # missing -> empty with schema

    df1 = _records(spark, [(0, "one", None), (1, "two", {"a": 1})])
    store.save_records(df1)
    assert store.exists()
    assert store.load_records().count() == 2

    # overwrite-swap: new content fully replaces old, no .tmp leftovers
    df2 = _records(spark, [(0, "replaced", None)])
    store.save_records(df2)
    got = store.load_records().collect()
    assert len(got) == 1 and got[0].body == "replaced"
    leftovers = [p for p in os.listdir(tmp_path / "db") if ".tmp-" in p or ".old-" in p]
    assert leftovers == []


def test_store_clean_idempotent(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path / "db"))
    store.save_records(_records(spark, [(0, "x", None)]))
    assert store.clean() is True
    assert store.clean() is False
    assert store.load_records().count() == 0


def test_yaml_validation_errors(spark):
    cases = [
        ("- not a mapping\n", "mapping"),
        ("---\nbody: no id\n", "id and body"),
        ("---\nid: -1\nbody: x\n", "non-negative"),
        ("---\nid: 0\nbody: x\n---\nid: 0\nbody: y\n", "duplicate"),
        ("---\nid: 0\nbody: 17\n", "string"),
        ("---\nid: 0\nbody: x\nmetadata: [1]\n", "mapping"),
    ]
    for text, needle in cases:
        with pytest.raises(yaml_io.YamlValidationError, match=needle):
            yaml_io.parse_records_yaml(text)


def test_yaml_gap_densification():
    rows = yaml_io.parse_records_yaml(
        "---\nid: 0\nbody: a\n---\nid: 3\nbody: d\n"
    )
    assert len(rows) == 4
    assert rows[1][1] == "" and rows[2][1] == ""  # gaps blank-filled
    assert rows[3][1] == "d"
