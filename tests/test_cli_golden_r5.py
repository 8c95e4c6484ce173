"""Round-5 reference-parity goldens: typed metadata fidelity, error
contracts, and path/filter edge cases surfaced by the self-review.

Same harness as test_cli_golden.py — the reference's analyze path runs
in-process against the same YAML and stdout is diffed byte-for-byte.
The typed database exercises exactly what the stringly triple could
not render or round-trip: int lists, nested maps, YAML dates, strings
needing quotes.
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import os
import sys
import types

import pytest

from c99_vectordb_spark import cli

TYPED_DB_YAML = """\
---
id: 0
metadata:
  source: user
  nums: [1, 2, 3]
  when: 2024-01-02
  label: 'a: b'
body: |-
  typed list and date record
---
id: 1
metadata:
  source: user
  nums: [1, 2, 3]
  cfg: {a: 1, b: [x, y]}
body: |-
  nested map record
---
id: 2
metadata:
  source: user
  nums: [4]
  mixed: [a, 'b, c']
body: |-
  quoted list element record
---
id: 3
metadata: {}
body: |-
  metadata-less record
"""


@pytest.fixture(scope="module")
def reference():
    if "faiss" not in sys.modules:
        sys.modules["faiss"] = types.ModuleType("faiss")
    spec = importlib.util.spec_from_file_location(
        "memo_cli_ref5", "/root/reference/memo_cli.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["memo_cli_ref5"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def db_base(tmp_path):
    base = str(tmp_path / "memo")
    with open(base + ".yaml", "w", encoding="utf-8") as f:
        f.write(TYPED_DB_YAML)
    return base


def _capture(fn, *args, **kwargs) -> tuple[str, str, int]:
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        rc = fn(*args, **kwargs)
    return out.getvalue(), err.getvalue(), rc


def _mine(db_base, argv):
    return _capture(cli.main, ["-f", db_base, *argv])


def _ref_analyze(reference, db_base, filter_expr, fields=None, stats=None):
    return _capture(
        reference.command_analyze,
        os.path.basename(db_base),
        filter_expr,
        fields,
        stats,
        100,
        0,
        os.path.dirname(db_base),
    )


TYPED_CASES = [
    {"filter": "source: user", "fields": ["id", "nums", "when", "label"]},
    {"filter": "source: user", "fields": ["id", "cfg", "mixed"]},
    {"filter": "source: user", "fields": ["id", "metadata"]},
    {"filter": "source: user", "stats": "nums"},
    {"filter": "source: user", "stats": "metadata"},
    {"filter": "source: user", "stats": "cfg"},
]


@pytest.mark.parametrize("case", TYPED_CASES)
def test_typed_metadata_analyze_matches_reference(spark, reference, db_base, case):
    ref_out, ref_err, ref_rc = _ref_analyze(
        reference, db_base, case["filter"], case.get("fields"), case.get("stats")
    )
    argv = ["analyze", "--filter", case["filter"]]
    if case.get("fields"):
        argv += ["--fields", ",".join(case["fields"])]
    if case.get("stats"):
        argv += ["--stats", case["stats"]]
    my_out, my_err, my_rc = _mine(db_base, argv)
    assert my_rc == ref_rc == 0
    assert my_out == ref_out, f"case {case}:\nREF:\n{ref_out}\nMINE:\n{my_out}"


def test_save_roundtrip_preserves_types(spark, reference, db_base):
    """After OUR save rewrites the YAML, the reference loader must see
    the ORIGINAL typed values — not stringified ones."""
    import datetime

    save_path = db_base + "_in.yaml"
    with open(save_path, "w", encoding="utf-8") as f:
        f.write("metadata:\n  k: [7, 8]\n  d: 2025-06-07\nbody: |-\n  appended\n")
    out, err, rc = _mine(db_base, ["save", save_path])
    assert rc == 0
    texts, metas = reference.load_yaml_tables(
        __import__("pathlib").Path(db_base + ".yaml")
    )
    # pre-existing typed values survived the rewrite
    assert metas[0]["nums"] == [1, 2, 3]
    assert metas[0]["when"] == datetime.date(2024, 1, 2)
    assert metas[0]["label"] == "a: b"
    assert metas[1]["cfg"] == {"a": 1, "b": ["x", "y"]}
    assert metas[2]["mixed"] == ["a", "b, c"]
    # and the appended entry kept its types too
    assert metas[4]["k"] == [7, 8]
    assert metas[4]["d"] == datetime.date(2025, 6, 7)


def test_load_error_matches_reference_contract(spark, reference, tmp_path):
    base = str(tmp_path / "bad")
    with open(base + ".yaml", "w", encoding="utf-8") as f:
        f.write("---\nid: 1\nbody: |-\n  a\n---\nid: 1\nbody: |-\n  b\n")
    my_out, my_err, my_rc = _mine(base, ["analyze", "--filter", "source: user"])
    ref_out, ref_err, ref_rc = _ref_analyze(reference, base, "source: user")
    assert my_rc == ref_rc == 1
    assert my_out == ref_out == ""
    # both name the yaml path and the duplicate id; exact message text
    # differs (loader wording), the CONTRACT (one stderr line, rc 1) holds
    assert my_err.startswith("Error: failed to load database YAML")
    assert ref_err.startswith("Error: failed to load database YAML")
    assert "duplicate id 1" in my_err and "duplicate id 1" in ref_err


def test_dotted_base_paths_match_reference(reference, tmp_path):
    yaml_path, emb_path = cli._db_paths(str(tmp_path / "data.v1"))
    ref_memo, ref_yaml = reference.build_db_paths("data.v1", str(tmp_path))
    assert yaml_path == str(ref_yaml)
    assert emb_path.endswith(".emb") and ".v1" not in os.path.basename(emb_path)


def test_empty_filter_still_gates_metadata(spark, db_base):
    """recall --filter '' parses to the empty map: every record with
    nonempty metadata matches, metadata-less records are excluded
    (memo_cli.py:483-506). A truthiness check would disable the gate."""
    out, err, rc = _mine(
        db_base, ["recall", "-k", "10", "--filter", "", "record"]
    )
    assert rc == 0
    assert "[3]" not in out  # the metadata-less record must not appear
    assert "[0]" in out and "[1]" in out and "[2]" in out


def test_save_error_path_echoes_in_batch_order(spark, reference, db_base):
    """Reference prints Memorized lines until the FIRST bad overwrite in
    batch order, then one error line (memo_cli.py:420-433); nothing is
    written to disk."""
    save_path = db_base + "_batch.yaml"
    with open(save_path, "w", encoding="utf-8") as f:
        f.write(
            "---\nmetadata: {s: a}\nbody: |-\n  first append\n"
            "---\nid: 99\nmetadata: {s: b}\nbody: |-\n  bad overwrite\n"
            "---\nid: 98\nmetadata: {s: c}\nbody: |-\n  later bad\n"
        )
    before = open(db_base + ".yaml", encoding="utf-8").read()
    out, err, rc = _mine(db_base, ["save", save_path])
    assert rc == 1
    assert out.splitlines() == ["Memorized: 'first append' (ID: 4)"]
    assert err.strip() == "Error: override id 99 does not exist"
    assert open(db_base + ".yaml", encoding="utf-8").read() == before


def test_nbsp_only_body_is_blank_like_reference(spark, reference, tmp_path):
    """A body of only U+00A0 is whitespace to the reference's Python
    \\s (skipped from recall); the Unicode is_blank matches."""
    assert reference.is_blank_body("  ")
    base = str(tmp_path / "nbsp")
    with open(base + ".yaml", "w", encoding="utf-8") as f:
        f.write(
            "---\nid: 0\nmetadata: {s: a}\nbody: |-\n  real content here\n"
            + "---\nid: 1\nmetadata: {s: a}\nbody: \"\\xa0\\xa0\"\n"
        )
    out, err, rc = _mine(base, ["recall", "-k", "5", "content"])
    assert rc == 0
    assert "[0]" in out
    assert "[1]" not in out
