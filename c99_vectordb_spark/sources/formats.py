"""Multi-format table IO: parquet / ORC / JSON-lines / CSV with
ROUND-TRIP-EXACT semantics.

The engine's canonical storage is parquet (columnar, typed, splittable
— the only sane choice at 100 TB), but real pipelines ingest and
export the other three constantly, and each has a silent-corruption
trap this module closes:

- **CSV** is untyped: reading without an explicit schema infers
  strings/doubles and destroys BIGINT/TIMESTAMP fidelity. Writers here
  emit a header but readers ALWAYS take the original schema. Free-text
  columns embed newlines and quotes — ``multiLine`` + explicit
  quote/escape make them survive. Timestamps round-trip through an
  explicit micros pattern (default CSV formatting drops sub-second
  precision on some paths).
- **JSON lines** preserves nesting but Spark's reader infers
  TIMESTAMP-looking strings only with the right options; schema is
  passed explicitly for the same reason as CSV.
- **ORC** is typed and columnar; the trap is only TIMESTAMP semantics
  (NTZ vs LTZ) — the UTC-pinned session (session.py) makes the
  round-trip exact.

Scale note: all four formats write/read through the same distributed
writer — per-partition files, no driver funnel. CSV/JSON are row
formats: fine as ingest/export edges, never as the join/scan hot path
(no column pruning, no predicate pushdown, full-file decode). The
round-trip tests (tests/test_formats.py) assert EXACT row parity per
format, timestamps and embedded newlines included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: micros-precision timestamp pattern shared by the CSV writer/reader
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_CSV_OPTIONS = {
    "header": "true",
    "multiLine": "true",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",
    "timestampFormat": _TS_FMT,
    # NTZ columns format/parse through the same micros pattern
    "timestampNTZFormat": _TS_FMT,
}

_JSON_OPTIONS = {
    "timestampFormat": _TS_FMT,
    "timestampNTZFormat": _TS_FMT,
    "ignoreNullFields": "false",
}


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write a table in the given format with round-trip-safe options."""
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.options(**_CSV_OPTIONS)
    elif fmt == "json":
        w = w.options(**_JSON_OPTIONS)
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, schema, fmt: str = "parquet"
) -> DataFrame:
    """Read a table written by :func:`write_table`. ``schema`` is
    REQUIRED for the untyped row formats (pass ``df.schema`` from the
    writer side, or the canonical table schema): inference would
    silently widen/narrow types and break integer-exact operators."""
    r = spark.read
    if fmt in ("csv", "json"):
        r = r.schema(schema)
        r = r.options(**(_CSV_OPTIONS if fmt == "csv" else _JSON_OPTIONS))
    return r.format(fmt).load(path)
