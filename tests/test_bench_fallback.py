"""The bench stale-fallback must be unmistakable at the TOP level.

VERDICT r3 #4/#5: a replayed BENCH_LAST.json line must not be readable as
a fresh measurement by a scoreboard that only parses metric/value/
vs_baseline.  These tests import bench.py without touching a device
(emit_stale_fallback only reads the cache file and prints).
"""
import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "BENCH_LAST", str(tmp_path / "BENCH_LAST.json"))
    return mod


def test_stale_fallback_nulls_headline_fields(bench, capsys):
    cached = {
        "metric": "vnet3d_sliding_window_vols_per_sec",
        "value": 4.944,
        "unit": "vols/s/chip",
        "vs_baseline": 1.876,
        "extra": {"measured_at": "2026-08-17T00:00:00+00:00"},
    }
    with open(bench.BENCH_LAST, "w") as f:
        json.dump(cached, f)

    assert bench.emit_stale_fallback() is True
    line = capsys.readouterr().out.strip()
    out = json.loads(line)

    # headline fields cannot be mistaken for a fresh run
    assert out["metric"].startswith("STALE: ")
    assert out["value"] is None
    assert out["vs_baseline"] is None
    # the real numbers survive, clearly relocated
    assert out["extra"]["stale_value"] == 4.944
    assert out["extra"]["stale_vs_baseline"] == 1.876
    assert "STALE" in out["extra"]
    assert "NOT a fresh run" in out["extra"]["STALE"]


def test_stale_fallback_without_cache_returns_false(bench, capsys):
    assert bench.emit_stale_fallback() is False
    assert capsys.readouterr().out.strip() == ""


def test_emit_persists_cache_for_fallback(bench, capsys):
    bench._emit({"metric": "m", "value": 1.0, "unit": "u",
                 "vs_baseline": 2.0, "extra": {}})
    fresh = json.loads(capsys.readouterr().out.strip())
    assert fresh["value"] == 1.0  # a FRESH emit keeps its headline fields
    with open(bench.BENCH_LAST) as f:
        on_disk = json.load(f)
    assert "measured_at" in on_disk["extra"]

    assert bench.emit_stale_fallback() is True
    replay = json.loads(capsys.readouterr().out.strip())
    assert replay["value"] is None and replay["metric"].startswith("STALE: ")
