"""S1/S2/S5 — the YAML compatibility adapter.

The reference's persistent format is a multi-document YAML stream, one
record per document (/root/reference/memo_cli.py:66-128). Parquet is
this engine's native store (store.py); this adapter exists so a user
of the reference can point the CLI at their existing ``.yaml`` file
and get identical semantics:

- load: full validation (mapping, id+body required, id >= 0 int, no
  duplicate ids, body str, metadata map) and densification — gaps in
  the id space materialize as blank records (memo_cli.py:89-107)
- save: canonical dump — every record including blanks, ``metadata: {}``
  for null, body as literal block scalar, explicit ``---`` separators,
  unsorted keys, unicode allowed (memo_cli.py:112-128)
- save-batch parsing with the reference's validations
  (memo_cli.py:369-400)

YAML files are human-scale (the reference loads them wholesale per
command), so the adapter parses driver-side; the resulting DataFrame
is immediately distributed. A 100 TB corpus lives in Parquet.
"""

from __future__ import annotations

from typing import Any

import yaml
from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import types as T

from ..fmt import LiteralStr
from ..model import RECORDS_SCHEMA, SAVE_BATCH_SCHEMA
from .convert import record_row, split_metadata

#: Spark MapType does not preserve insertion order, but the reference
#: renders metadata dicts in YAML insertion order (format_cell /
#: save_yaml_tables with sort_keys=False). The adapter carries the
#: original key order in an extra column.
_KEYS_FIELD = T.StructField("metadata_keys", T.ArrayType(T.StringType()), True)
YAML_RECORDS_SCHEMA = T.StructType([*RECORDS_SCHEMA.fields, _KEYS_FIELD])
YAML_BATCH_SCHEMA = T.StructType([*SAVE_BATCH_SCHEMA.fields, _KEYS_FIELD])


class YamlValidationError(ValueError):
    pass


def _parse_docs(text: str) -> list[dict]:
    return [d for d in yaml.safe_load_all(text) if d is not None]


def parse_records_yaml(text: str) -> list[tuple]:
    """Multi-doc YAML -> validated dense RECORDS_SCHEMA rows."""
    by_id: dict[int, tuple[str, dict | None]] = {}
    for doc in _parse_docs(text):
        if not isinstance(doc, dict):
            raise YamlValidationError("record must be a mapping")
        if "id" not in doc or "body" not in doc:
            raise YamlValidationError("record requires id and body")
        rid = doc["id"]
        if not isinstance(rid, int) or isinstance(rid, bool) or rid < 0:
            raise YamlValidationError(f"id must be a non-negative int: {rid!r}")
        if rid in by_id:
            raise YamlValidationError(f"duplicate id {rid}")
        body = doc["body"]
        if not isinstance(body, str):
            raise YamlValidationError(f"body must be a string (id {rid})")
        metadata = doc.get("metadata")
        if metadata is not None and not isinstance(metadata, dict):
            raise YamlValidationError(f"metadata must be a mapping (id {rid})")
        by_id[rid] = (body, metadata or None)
    n = (max(by_id) + 1) if by_id else 0
    rows = []
    for i in range(n):  # densify: gaps become blank records
        body, metadata = by_id.get(i, ("", None))
        keys = [str(k) for k in metadata.keys()] if metadata else None
        rows.append((*record_row(i, body, metadata), keys))
    return rows


def load_records_yaml(spark: SparkSession, path: str) -> DataFrame:
    try:
        with open(path, encoding="utf-8") as f:
            rows = parse_records_yaml(f.read())
    except FileNotFoundError:
        rows = []
    return spark.createDataFrame(rows, YAML_RECORDS_SCHEMA)


def _revive(scalar: str | None, tag: str | None):
    """Best-effort inverse of convert.split_metadata stringification
    for canonical YAML round-trips."""
    if scalar is None:
        return None
    if tag == "int":
        return int(scalar)
    if tag == "float":
        return float(scalar)
    if tag == "bool":
        return scalar == "True"
    return scalar


def revive_metadata(r) -> dict[str, Any]:
    """Reconstruct the dynamic metadata dict of one collected row, in
    original key order when ``metadata_keys`` is available."""
    scalars = r["metadata"] or {}
    tags = r["metadata_types"] or {}
    lists = r["metadata_lists"] or {}
    try:
        order = r["metadata_keys"]
    except (KeyError, ValueError):
        order = None
    if order is None:
        order = [*scalars.keys(), *[k for k in lists.keys() if k not in scalars]]
    md: dict[str, Any] = {}
    for k in order:
        if k in lists and lists[k] is not None:
            md[k] = list(lists[k])
        elif k in scalars:
            md[k] = _revive(scalars[k], tags.get(k))
    return md


def records_to_yaml(rows: list) -> str:
    """Canonical multi-doc dump of collected RECORDS_SCHEMA rows
    (ordered by id; caller collects — adapter-scale only)."""
    docs = []
    for r in sorted(rows, key=lambda r: r["id"]):
        md = revive_metadata(r)
        docs.append(
            {"id": r["id"], "metadata": md, "body": LiteralStr(r["body"] or "")}
        )
    return yaml.safe_dump_all(
        docs, explicit_start=True, sort_keys=False, allow_unicode=True
    )


def save_records_yaml(records: DataFrame, path: str) -> None:
    rows = records.collect()
    with open(path, "w", encoding="utf-8") as f:
        f.write(records_to_yaml(rows))


def parse_save_batch_yaml(text: str) -> list[tuple]:
    """Save-batch file -> SAVE_BATCH_SCHEMA rows (memo_cli.py:369-400):
    1+ entries; body non-empty string; optional id >= 0; metadata map."""
    parsed = _parse_docs(text)
    entries: list[dict] = []
    for doc in parsed:
        if isinstance(doc, list):
            entries.extend(doc)
        else:
            entries.append(doc)
    if not entries:
        raise YamlValidationError("save file contains no entries")
    rows = []
    for e in entries:
        if not isinstance(e, dict):
            raise YamlValidationError("save entry must be a mapping")
        body = e.get("body")
        if not isinstance(body, str) or not body.strip():
            raise YamlValidationError("save entry requires a non-empty body string")
        rid = e.get("id")
        if rid is not None and (
            not isinstance(rid, int) or isinstance(rid, bool) or rid < 0
        ):
            raise YamlValidationError(f"id must be a non-negative int: {rid!r}")
        metadata = e.get("metadata")
        if metadata is not None and not isinstance(metadata, dict):
            raise YamlValidationError("metadata must be a mapping")
        scalars, tags, lists = split_metadata(metadata or None)
        keys = [str(k) for k in metadata.keys()] if metadata else None
        rows.append((rid, body, scalars, tags, lists, keys))
    return rows


def load_save_batch_yaml(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as f:
        rows = parse_save_batch_yaml(f.read())
    return spark.createDataFrame(rows, YAML_BATCH_SCHEMA)
