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


def _canon_rows(df):
    return sorted(
        (
            r.id,
            r.body,
            tuple(sorted((r.metadata or {}).items())),
            tuple(sorted((r.metadata_types or {}).items())),
            tuple(sorted((k, tuple(v)) for k, v in (r.metadata_lists or {}).items())),
            tuple(r.metadata_keys) if r.metadata_keys else None,
        )
        for r in df.collect()
    )


def test_distributed_yaml_parse_matches_driver(spark, tmp_path):
    """The distributed S1 path (mapInPandas parse + groupBy dup probe +
    range densify) must produce exactly the driver-side rows on a
    corpus with gaps, unicode, blanks, and mixed metadata."""
    import yaml as _y

    from c99_vectordb_spark.fmt import LiteralStr

    docs = []
    for i in [0, 1, 2, 5, 6, 9, 12]:  # gaps at 3,4,7,8,10,11
        md = None
        if i % 3 == 0:
            md = {"source": f"src{i}", "priority": i, "tags": ["a", "b"]}
        elif i % 3 == 1:
            md = {"note": "ünïcode välue", "score": i / 2.0}
        body = "  " if i == 6 else f"bödy {i}\nsecond line {i}"
        docs.append({"id": i, "metadata": md or {}, "body": LiteralStr(body)})
    path = str(tmp_path / "db.yaml")
    with open(path, "w", encoding="utf-8") as f:
        f.write(
            _y.safe_dump_all(
                docs, explicit_start=True, sort_keys=False, allow_unicode=True
            )
        )
    driver = yaml_io.load_records_yaml(spark, path)
    dist = yaml_io.load_records_yaml(spark, path, distributed_bytes=0)
    assert _canon_rows(dist) == _canon_rows(driver)
    assert dist.count() == 13  # densified through the gaps


def test_distributed_yaml_parse_error_parity(spark, tmp_path):
    """Duplicate-id and invalid-record errors must match the driver
    path's messages on the distributed path too."""
    import yaml as _y

    base = str(tmp_path / "dup.yaml")
    with open(base, "w", encoding="utf-8") as f:
        f.write(
            _y.safe_dump_all(
                [
                    {"id": 0, "metadata": {}, "body": "a"},
                    {"id": 1, "metadata": {}, "body": "b"},
                    {"id": 1, "metadata": {}, "body": "c"},
                ],
                explicit_start=True,
                sort_keys=False,
            )
        )
    with pytest.raises(yaml_io.YamlValidationError, match="duplicate id 1"):
        yaml_io.load_records_yaml(spark, base, distributed_bytes=0)

    bad = str(tmp_path / "bad.yaml")
    with open(bad, "w", encoding="utf-8") as f:
        f.write(
            _y.safe_dump_all(
                [{"id": 0, "metadata": {}, "body": "a"}, {"id": -3, "body": "x"}],
                explicit_start=True,
                sort_keys=False,
            )
        )
    with pytest.raises(yaml_io.YamlValidationError, match="non-negative int: -3"):
        yaml_io.load_records_yaml(spark, bad, distributed_bytes=0)


def test_noncanonical_stream_falls_back_to_driver_parse(spark, tmp_path):
    """Valid-YAML forms the line splitter can't segment ('---' with
    inline content, '...' end markers, %YAML directives) must take the
    driver safe_load_all path even above the distributed threshold —
    same rows, no silent mis-split."""
    text = (
        "%YAML 1.1\n"
        "--- {id: 0, metadata: {}, body: flow style}\n"
        "...\n"
        "---\nid: 1\nmetadata: {}\nbody: block style\n"
    )
    assert not yaml_io._split_is_canonical(text)
    path = str(tmp_path / "odd.yaml")
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    # distributed_bytes=0 would normally force the distributed path;
    # the canonicality gate must reroute to the driver parse
    dist = yaml_io.load_records_yaml(spark, path, distributed_bytes=0)
    driver = yaml_io.load_records_yaml(spark, path)
    assert _canon_rows(dist) == _canon_rows(driver)
    assert dist.count() == 2

    # trailing whitespace after '---' IS canonical (plain separator)
    assert yaml_io._split_is_canonical("--- \nid: 0\nbody: a\n")


def test_distributed_error_is_first_in_document_order(spark, tmp_path):
    """With several invalid docs the distributed path must raise the
    FIRST one in document order (driver-path parity), not whichever
    partition finished first."""
    import yaml as _y

    docs = [{"id": 0, "metadata": {}, "body": "ok"}]
    # doc 1 is the first error; docs 2..40 carry different errors
    docs.append({"id": -7, "body": "first bad"})
    for i in range(2, 41):
        docs.append({"id": i, "body": 123})  # body must be a string
    path = str(tmp_path / "manybad.yaml")
    with open(path, "w", encoding="utf-8") as f:
        f.write(_y.safe_dump_all(docs, explicit_start=True, sort_keys=False))
    for _ in range(3):  # would be flaky if partition-order-dependent
        with pytest.raises(
            yaml_io.YamlValidationError, match="non-negative int: -7"
        ):
            yaml_io.load_records_yaml(spark, path, distributed_bytes=0)
