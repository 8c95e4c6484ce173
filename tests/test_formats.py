"""Round-trip-exact multi-format IO (sources/formats.py).

Every format must reproduce the original rows EXACTLY — types,
timestamps to the microsecond, free text with embedded newlines and
quotes. CSV and JSON are the dangerous ones (untyped / inference), so
the suite drives them through the worst columns the testdata has.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.sources.formats import read_table, write_table

FORMATS = ["parquet", "orc", "json", "csv"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", FORMATS)
def test_orders_roundtrip_exact(spark, sf_dir, tmp_path, fmt):
    """Typed columns: BIGINT keys, DOUBLE prices, string dates."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / f"orders_{fmt}")
    write_table(df, path, fmt)
    back = read_table(spark, path, df.schema, fmt)
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)


@pytest.mark.parametrize("fmt", FORMATS)
def test_documents_roundtrip_exact(spark, sf_dir, tmp_path, fmt):
    """Free text straight from the corpus plus ADVERSARIAL rows:
    embedded newlines, quotes, commas, the CSV null sentinel, and
    empty string vs NULL (the classic CSV corruption set)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = spark.createDataFrame(
        [
            (900001, 'line1\nline2 "quoted", comma', "en", "srcx", 5),
            (900002, "", "en", "srcx", 0),
            (900003, None, None, "srcx", 0),
            (900004, "\\N literal backslash-N", "en", "srcx", 3),
        ],
        df.schema,
    )
    both = df.unionByName(extra)
    path = str(tmp_path / f"docs_{fmt}")
    write_table(both, path, fmt)
    back = read_table(spark, path, both.schema, fmt)
    # exact for EVERY format — including CSV, where the nullValue
    # sentinel keeps NULL distinguishable from the quoted empty string
    # (the fixture carries one of each to prove it)
    assert _rows(back) == _rows(both)


@pytest.mark.parametrize("fmt", FORMATS)
def test_events_timestamps_roundtrip_micros(spark, sf_dir, tmp_path, fmt):
    """Timestamps to the MICROSECOND through every format — the CSV
    and JSON default patterns silently truncate sub-second precision;
    the explicit micros pattern must not."""
    from c99_vectordb_spark.queries_registry import _read_events

    ev = _read_events(spark, sf_dir).select("user_id", "event_type", "ts", "ts_us")
    path = str(tmp_path / f"events_{fmt}")
    write_table(ev, path, fmt)
    back = read_table(spark, path, ev.schema, fmt)
    assert back.schema == ev.schema
    # microsecond-exact: recompute epoch micros from the round-tripped
    # NTZ timestamp and compare with the carried integer column
    mism = back.filter(
        F.unix_micros(F.col("ts").cast("timestamp")) != F.col("ts_us")
    ).count()
    assert mism == 0
    assert _rows(back.select("user_id", "event_type", "ts_us")) == _rows(
        ev.select("user_id", "event_type", "ts_us")
    )


def test_csv_without_schema_is_documented_hazard(spark, sf_dir, tmp_path):
    """The failure mode the module exists to prevent: inferring a CSV
    read widens BIGINT doc ids and token counts — assert the hazard is
    real so the explicit-schema contract stays motivated."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "hazard_csv")
    write_table(df, path, "csv")
    inferred = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .csv(path)
    )
    assert inferred.schema != df.schema  # all-string without inference
