"""Probe-gate harness logic (scripts/probe_gate.py) — the committed
form of the recorded measurement protocol (BASELINE.md).  Probes are
monkeypatched so no test burns real CPU-seconds."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import probe_gate as pg  # noqa: E402


def _gate(**kw):
    kw.setdefault("threshold", 0.75)
    kw.setdefault("enabled", True)
    kw.setdefault("retry_sleep", 0.0)
    return pg.ProbeGate(**kw)


def test_disabled_gate_is_transparent(monkeypatch):
    monkeypatch.setattr(pg, "probe_sec", lambda: pytest.fail(
        "disabled gate must never probe"))
    g = _gate(enabled=False)
    result, ok = g.run(lambda att: 42, label="x")
    assert (result, ok) == (42, True)
    assert g.probes == []


def test_healthy_window_accepts_first_sample(monkeypatch):
    walls = iter([0.4, 0.45])
    monkeypatch.setattr(pg, "probe_sec", lambda: next(walls))
    g = _gate()
    result, ok = g.run(lambda att: ("sample", att), label="x")
    assert (result, ok) == (("sample", 0), True)
    assert g.rejected == 0 and g.waited == 0
    assert g.probes == [0.4, 0.45]


def test_degraded_trailing_probe_rejects_and_retries(monkeypatch):
    # pre ok, post slow -> reject; slow carry -> wait; fresh pre ok,
    # post ok -> accept the SECOND sample
    walls = iter([0.4, 2.0, 0.4, 0.45])
    monkeypatch.setattr(pg, "probe_sec", lambda: next(walls))
    calls = []
    g = _gate()
    result, ok = g.run(lambda att: calls.append(att) or att, label="x")
    assert ok and result == calls[-1]
    assert g.rejected == 1 and g.waited == 1
    assert len(calls) == 2


def test_slow_leading_probe_waits_without_sampling(monkeypatch):
    # degraded, degraded, healthy: two waits, zero wasted samples
    walls = iter([2.0, 2.0, 0.4, 0.4])
    monkeypatch.setattr(pg, "probe_sec", lambda: next(walls))
    calls = []
    g = _gate()
    result, ok = g.run(lambda att: calls.append(att) or "r", label="x")
    assert ok and result == "r"
    assert g.waited == 2 and g.rejected == 0 and len(calls) == 1


def test_exhausted_retries_return_ungated_sample(monkeypatch):
    monkeypatch.setattr(pg, "probe_sec", lambda: 9.9)
    calls = []
    g = _gate(max_retries=2)
    result, ok = g.run(lambda att: calls.append(att) or "last", label="x")
    assert not ok and result == "last"
    assert len(calls) >= 1  # degraded throughout -> still one honest sample


def test_consecutive_samples_share_boundary_probe(monkeypatch):
    # probe before / BETWEEN / after: sample 2's leading probe is
    # sample 1's trailing one, so 2 gated samples cost 3 probes
    walls = iter([0.4, 0.45, 0.5])
    monkeypatch.setattr(pg, "probe_sec", lambda: next(walls))
    g = _gate()
    _, ok1 = g.run(lambda att: 1, label="a")
    _, ok2 = g.run(lambda att: 2, label="b")
    assert ok1 and ok2
    assert g.probes == [0.4, 0.45, 0.5]


def test_real_probe_returns_positive_wall():
    assert pg.probe_sec() > 0.0


def test_telemetry_shape():
    g = _gate()
    t = g.telemetry()
    assert set(t) == {"enabled", "threshold_sec", "rejected_samples",
                      "waited_attempts", "probe_walls"}
