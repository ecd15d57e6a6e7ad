"""Smoke tests for the streaming bench harness (bench_streaming.py).

Short durations — these pin the harness machinery (producer/warmup/drain
accounting, exact latency attribution), not the numbers."""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture()
def bench_mod(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SECONDS", "2")
    import bench_streaming

    importlib.reload(bench_streaming)
    yield bench_streaming
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SECONDS")
    importlib.reload(bench_streaming)


def test_pattern_runcap_scenario(spark, tmp_path, bench_mod):
    r = bench_mod.bench_pattern_runcap(spark, str(tmp_path / "w"), rows_per_tick=500)
    assert r["input_events"] > 0
    assert r["alerts"] > 0
    assert r["latency_ms"]["n"] == r["alerts"]
    assert r["latency_ms"]["p50"] is not None and r["latency_ms"]["p50"] > 0
    assert r["sustained_eps"] > 0


def test_trend_windowed_scenario(spark, tmp_path, bench_mod):
    r = bench_mod.bench_trend_windowed(spark, str(tmp_path / "w"), users=16)
    assert r["input_events"] > 0
    assert r["alerts"] > 0
    # every latency sample maps to a real producer tick; attribution holds
    assert 0 < r["latency_ms"]["n"] <= r["alerts"]


def test_dedup_history_scenario(spark, tmp_path, bench_mod):
    r = bench_mod.bench_dedup_history(spark, str(tmp_path / "w"), docs_per_tick=32)
    assert r["input_events"] > 0
    # near-dup clones are injected, so pairs must surface
    assert r["alerts"] > 0
    assert r["latency_ms"]["n"] > 0


def test_compact_block_shape(bench_mod):
    full = {
        "pattern_runcap": {
            "sustained_eps": 5000,
            "alerts": 10,
            "latency_ms": {"p50": 900.0, "p99": 1500.0},
        },
        "trend_windowed": {"error": "boom"},
        "ref_flink_avg_alert_ms": 554,
    }
    c = bench_mod.compact_streaming(full)
    assert c["pattern_runcap"] == {
        "eps": 5000,
        "alerts": 10,
        "p50_ms": 900.0,
        "p99_ms": 1500.0,
    }
    assert "error" in c["trend_windowed"]
    assert c["ref_flink_avg_alert_ms"] == 554


def test_contended_artifact_path_appends_never_clobbers(monkeypatch, tmp_path):
    """VERDICT r10 finding #2: a contended re-run must land in the first
    free `_contended[.k].json` slot, leaving earlier (possibly committed)
    contended records untouched. Idle paths stay stable."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_ROUND", "99")
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    idle = bench._detail_path(False)
    assert idle.endswith("BENCH_LOCAL_r99.json")
    assert bench._detail_path(False) == idle  # idle path is stable

    first = bench._detail_path(True)
    assert first.endswith("BENCH_LOCAL_r99_contended.json")
    open(first, "w").write("{}")
    second = bench._detail_path(True)
    assert second.endswith("BENCH_LOCAL_r99_contended.2.json")
    open(second, "w").write("{}")
    assert bench._detail_path(True).endswith("BENCH_LOCAL_r99_contended.3.json")
