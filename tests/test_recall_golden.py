"""Recall golden vs the EXECUTED reference CLI.

The reference's embedding uses Python's salted ``hash()``, so its
scores are only reproducible under a pinned PYTHONHASHSEED — it runs
in a subprocess with PYTHONHASHSEED=0 and the exact-search faiss
substitute (tests/_faiss_stub). Our engine uses the stable cross-engine
hash (SURVEY §1.3), so SCORES legitimately differ; what must match is

- the rank STRUCTURE: the sequence of score-tie groups (sets of ids at
  equal score) is identical on a corpus with designed overlap levels;
- the output FORMAT: byte-exact after masking the score numbers.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import subprocess
import sys

import pytest

from c99_vectordb_spark import cli

STUB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_faiss_stub")
REFERENCE = "/root/reference/memo_cli.py"

# designed overlap: {0,1} exact duplicates of the query, 2 half
# overlap, {3,4} disjoint — every engine with a token-bag embedding
# must produce the tie-group sequence [{0,1}, {2}, {3,4}]
DB_YAML = """\
---
id: 0
metadata:
  source: a
body: |-
  alpha bravo charlie delta
---
id: 1
metadata:
  source: b
body: |-
  alpha bravo charlie delta
---
id: 2
metadata:
  source: c
body: |-
  alpha bravo echo foxtrot
---
id: 3
metadata:
  source: d
body: |-
  golf hotel india juliet
---
id: 4
metadata:
  source: e
body: |-
  kilo lima mike november
"""

QUERY = ["alpha", "bravo", "charlie", "delta"]


def _run_reference(tmp_path, argv):
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = "0"
    env["PYTHONPATH"] = STUB_DIR + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, REFERENCE, "-f", "memo", *argv],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )


@pytest.fixture()
def ref_db(tmp_path):
    (tmp_path / "memo.yaml").write_text(DB_YAML, encoding="utf-8")
    r = _run_reference(tmp_path, ["reindex"])  # builds memo.memo
    assert r.returncode == 0, r.stderr
    return tmp_path


def _score_groups(out: str) -> list[frozenset]:
    """Parse recall output into the sequence of score-tie id groups."""
    hits = re.findall(r"^  \[(\d+)\] Score: ([-\d.]+) \|$", out, re.M)
    groups, last_score = [], None
    for doc_id, score in hits:
        if score != last_score:
            groups.append(set())
            last_score = score
        groups[-1].add(int(doc_id))
    return [frozenset(g) for g in groups]


MASK = re.compile(r"Score: [-\d.]+")


def test_recall_rank_structure_and_format_match_reference(spark, ref_db):
    ref = _run_reference(ref_db, ["recall", "-k", "5", *QUERY])
    assert ref.returncode == 0, ref.stderr

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["-f", str(ref_db / "memo"), "recall", "-k", "5", *QUERY])
    assert rc == 0
    mine = buf.getvalue()

    mine_groups = _score_groups(mine)
    ref_groups = _score_groups(ref.stdout)
    # our stable-hash embedding: disjoint docs tie at exactly 2.0
    assert mine_groups == [frozenset({0, 1}), frozenset({2}), frozenset({3, 4})]
    # reference (salted hash) must agree on every forced structure
    # point: exact duplicates of the query tie first, the half-overlap
    # doc is alone next, the disjoint docs come last (their relative
    # scores may split on hash-bucket collisions — embedding-level
    # freedom, not rank-structure divergence)
    assert ref_groups[0] == frozenset({0, 1})
    assert ref_groups[1] == frozenset({2})
    assert frozenset().union(*ref_groups[2:]) == frozenset({3, 4})
    # identical visible order + byte-exact format modulo score values
    assert MASK.sub("Score: X", mine) == MASK.sub("Score: X", ref.stdout)


def test_recall_filtered_matches_reference(spark, ref_db):
    ref = _run_reference(
        ref_db, ["recall", "-k", "3", "--filter", "source: b", *QUERY]
    )
    assert ref.returncode == 0, ref.stderr
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(
            ["-f", str(ref_db / "memo"), "recall", "-k", "3", "--filter",
             "source: b", *QUERY]
        )
    assert rc == 0
    mine = buf.getvalue()
    assert _score_groups(mine) == _score_groups(ref.stdout) == [frozenset({1})]
    assert MASK.sub("Score: X", mine) == MASK.sub("Score: X", ref.stdout)
