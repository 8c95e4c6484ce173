"""bench_gate threshold logic: per-entry calibration pairing."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gate():
    spec = importlib.util.spec_from_file_location(
        "bench_gate_mod", os.path.join(REPO, "tools", "bench_gate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(tmp_path, monkeypatch, best, bench, calib_now, update=False):
    g = _load_gate()
    best_path = tmp_path / "best.json"
    best_path.write_text(json.dumps(best))
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps(bench))
    monkeypatch.setattr(g, "BEST_PATH", str(best_path))
    monkeypatch.setattr(g, "_calibrate", lambda: calib_now)
    monkeypatch.setattr(g, "_confirm_rerun", lambda names, sf: {})
    argv = [str(bench_path)] + (["--update"] if update else [])
    rc = g.main(argv)
    return rc, json.loads(best_path.read_text())


def test_fast_era_best_stretches_on_slow_host(tmp_path, monkeypatch):
    # best 1.0s at calib 0.10; host now at 0.15 (1.5x slower): a 1.8s
    # reading is within 1.0 * 1.5 * 1.3 + 0.25 and must NOT fail
    best = {"0.1": {"q": {"sec": 1.0, "calib": 0.10}}, "__calib__": 0.10}
    bench = {"sf": 0.1, "queries": {"q": 1.8}}
    rc, _ = _run(tmp_path, monkeypatch, best, bench, calib_now=0.15)
    assert rc == 0


def test_slow_era_best_not_stretched_on_same_host(tmp_path, monkeypatch):
    # best recorded at calib 0.15; same host: a 2.2x regression fails
    best = {"0.1": {"q": {"sec": 1.0, "calib": 0.15}}, "__calib__": 0.10}
    bench = {"sf": 0.1, "queries": {"q": 2.2}}
    rc, _ = _run(tmp_path, monkeypatch, best, bench, calib_now=0.15)
    assert rc == 1


def test_update_records_raw_sec_with_current_calib(tmp_path, monkeypatch):
    best = {"0.1": {}, "__calib__": 0.10}
    bench = {"sf": 0.1, "queries": {"q": 0.8}}
    rc, out = _run(tmp_path, monkeypatch, best, bench, calib_now=0.15, update=True)
    assert rc == 0
    assert out["0.1"]["q"] == {"sec": 0.8, "calib": 0.15}
    # __calib__ only ever lowers
    assert out["__calib__"] == 0.10


def test_legacy_float_entries_use_file_calib(tmp_path, monkeypatch):
    best = {"0.1": {"q": 1.0}, "__calib__": 0.10}
    bench = {"sf": 0.1, "queries": {"q": 1.8}}
    rc, _ = _run(tmp_path, monkeypatch, best, bench, calib_now=0.15)
    assert rc == 0  # stretched via the file-level calibration
    rc2, _ = _run(tmp_path, monkeypatch, best, bench, calib_now=0.10)
    assert rc2 == 1  # same reading on the fast host IS a regression


def test_inherited_calib_stretch_is_capped_tighter(tmp_path, monkeypatch):
    # legacy float best with __calib__ = fastest-ever 0.10; host now 2x
    # slower. A recorded-calib entry would stretch 2.0x (cap), letting
    # 2.5s pass; an INHERITED calib caps at 1.25x, so 2.5s must fail
    # (round-5 advisor: full-cap stretch on inherited calib lets a real
    # ~2.85x regression pass as host drift).
    best = {"0.1": {"q": 1.0}, "__calib__": 0.10}
    bench = {"sf": 0.1, "queries": {"q": 2.5}}
    rc, _ = _run(tmp_path, monkeypatch, best, bench, calib_now=0.20)
    assert rc == 1
    # the same reading with a RECORDED calib is within the 2.0x cap
    best2 = {"0.1": {"q": {"sec": 1.0, "calib": 0.10}}, "__calib__": 0.10}
    rc2, _ = _run(tmp_path, monkeypatch, best2, bench, calib_now=0.20)
    assert rc2 == 0
    # within the tighter cap, an inherited-calib entry still stretches
    bench3 = {"sf": 0.1, "queries": {"q": 1.8}}
    rc3, _ = _run(tmp_path, monkeypatch, best, bench3, calib_now=0.20)
    assert rc3 == 0


def test_stdin_mode_skips_compact_summary_line(tmp_path, monkeypatch):
    """bench.py prints the full per-query line FIRST and a compact
    summary (no 'queries') LAST; the stdin gate must scan back to the
    per-query line instead of gating zero queries against the summary
    (round-6 self-review: the documented pipe invocation silently
    passed any regression)."""
    import io

    g = _load_gate()
    best_path = tmp_path / "best.json"
    best_path.write_text(json.dumps(
        {"0.1": {"q": {"sec": 1.0, "calib": 0.10}}, "__calib__": 0.10}
    ))
    monkeypatch.setattr(g, "BEST_PATH", str(best_path))
    monkeypatch.setattr(g, "_calibrate", lambda: 0.10)
    monkeypatch.setattr(g, "_confirm_rerun", lambda names, sf: {})
    full = json.dumps({"sf": 0.1, "queries": {"q": 9.9}})
    compact = json.dumps({"sf": 0.1, "value": 9.9, "n": 1})
    monkeypatch.setattr("sys.stdin", io.StringIO(full + "\n" + compact + "\n"))
    assert g.main([]) == 1  # the 9.9s regression must be SEEN and fail

    # summary-only stdin is an explicit error, not a silent pass
    monkeypatch.setattr("sys.stdin", io.StringIO(compact + "\n"))
    assert g.main([]) == 2


def test_snapshot_embedded_calib_overrides_live_probe(tmp_path, monkeypatch):
    """Gating a stored BENCH_rN.json must use the snapshot's own
    embedded __calib__ (the host speed at MEASUREMENT time), not a live
    probe at gate time (judge r10 ask #2: three gate runs on the same
    r10 snapshot flagged three disjoint mover sets purely from
    live-probe jitter). Here the live probe says the host is fast
    (0.10) but the snapshot was measured on a 1.5x-slower host (0.15):
    the 1.8s reading is noise of the slow measurement era and passes."""
    best = {"0.1": {"q": {"sec": 1.0, "calib": 0.10}}, "__calib__": 0.10}
    bench = {"sf": 0.1, "queries": {"q": 1.8}, "__calib__": 0.15}
    rc, _ = _run(tmp_path, monkeypatch, best, bench, calib_now=0.10)
    assert rc == 0
    # and WITHOUT the embedded calib the same reading fails on the
    # fast live probe — the override is load-bearing
    bench2 = {"sf": 0.1, "queries": {"q": 1.8}}
    rc2, _ = _run(tmp_path, monkeypatch, best, bench2, calib_now=0.10)
    assert rc2 == 1


def test_pretty_printed_snapshot_file_parses(tmp_path, monkeypatch):
    """BENCH_FULL_rN.json is one pretty-printed (multi-line) object;
    the file path must parse it whole instead of dying line-wise
    ('no JSON bench line' on every stored full snapshot)."""
    g = _load_gate()
    best_path = tmp_path / "best.json"
    best_path.write_text(json.dumps(
        {"0.1": {"q": {"sec": 1.0, "calib": 0.10}}, "__calib__": 0.10}
    ))
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps(
        {"sf": 0.1, "queries": {"q": 1.1}, "__calib__": 0.10}, indent=1
    ))
    monkeypatch.setattr(g, "BEST_PATH", str(best_path))
    monkeypatch.setattr(g, "_calibrate", lambda: 0.10)
    monkeypatch.setattr(g, "_confirm_rerun", lambda names, sf: {})
    assert g.main([str(bench_path)]) == 0


def test_confirm_rerun_breach_uses_live_calib(tmp_path, monkeypatch):
    """Re-run samples execute on TODAY's host, so their breach test
    must use a live probe even when the snapshot embeds a different
    measurement-era calib. Snapshot era is fast (0.10) but the gate
    host is 1.5x slower (0.15): the 1.8s re-run is host drift, not a
    confirmed regression."""
    g = _load_gate()
    best_path = tmp_path / "best.json"
    best_path.write_text(json.dumps(
        {"0.1": {"q": {"sec": 1.0, "calib": 0.10}}, "__calib__": 0.10}
    ))
    bench_path = tmp_path / "bench.json"
    bench_path.write_text(json.dumps(
        {"sf": 0.1, "queries": {"q": 9.9}, "__calib__": 0.10}
    ))
    monkeypatch.setattr(g, "BEST_PATH", str(best_path))
    monkeypatch.setattr(g, "_calibrate", lambda: 0.15)
    monkeypatch.setattr(g, "_confirm_rerun", lambda names, sf: {"q": 1.8})
    assert g.main([str(bench_path)]) == 0
