"""End-to-end CLI property parity: generated YAML databases + filters,
my `analyze` stdout diffed byte-for-byte against the reference CLI."""

from __future__ import annotations

import contextlib
import importlib.util
import io
import os
import sys
import types

import pytest
import yaml as _yaml
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from c99_vectordb_spark import cli
from c99_vectordb_spark.fmt import LiteralStr


@pytest.fixture(scope="module")
def reference():
    if "faiss" not in sys.modules:
        sys.modules["faiss"] = types.ModuleType("faiss")
    spec = importlib.util.spec_from_file_location(
        "memo_cli_ref4", "/root/reference/memo_cli.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["memo_cli_ref4"] = mod
    spec.loader.exec_module(mod)
    return mod


KEYS = ["source", "priority", "category", "tags"]
meta_vals = st.one_of(
    st.sampled_from(["user", "chat", "pref_a", "pref_b", "2026-01-02"]),
    st.integers(min_value=0, max_value=9),
    st.lists(st.sampled_from(["food", "ops"]), min_size=1, max_size=2),
)
metadatas = st.one_of(
    st.none(), st.dictionaries(st.sampled_from(KEYS), meta_vals, max_size=3)
)

filters = st.sampled_from(
    [
        "source: user",
        "priority: {$gte: 3}",
        "category: {$prefix: pref}",
        "tags: {$contains: food}",
        "{source: chat, priority: {$lte: 5}}",
        "$or: [{source: user}, {tags: ops}]",
    ]
)
stats_keys = st.sampled_from([None, "priority", "source", "category"])


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    mds=st.lists(metadatas, min_size=1, max_size=6),
    filt=filters,
    stats=stats_keys,
)
def test_cli_analyze_parity_generated(spark, reference, tmp_path_factory, mds, filt, stats):
    tmp = tmp_path_factory.mktemp("clidb")
    base = str(tmp / "db")
    docs = [
        {
            "id": i,
            "metadata": md or {},
            "body": LiteralStr(f"record body {i}"),
        }
        for i, md in enumerate(mds)
    ]
    with open(base + ".yaml", "w", encoding="utf-8") as f:
        f.write(
            _yaml.safe_dump_all(
                docs, explicit_start=True, sort_keys=False, allow_unicode=True
            )
        )

    def cap(fn, *a):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = fn(*a)
        return buf.getvalue(), rc

    ref_out, ref_rc = cap(
        reference.command_analyze,
        os.path.basename(base),
        filt,
        None,
        stats,
        100,
        0,
        os.path.dirname(base),
    )
    argv = ["-f", base, "analyze", "--filter", filt]
    if stats:
        argv += ["--stats", stats]
    my_out, my_rc = cap(cli.main, argv)
    assert my_rc == ref_rc == 0
    assert my_out == ref_out, (
        f"filter={filt!r} stats={stats!r} mds={mds!r}\n"
        f"REF:\n{ref_out}\nMINE:\n{my_out}"
    )
