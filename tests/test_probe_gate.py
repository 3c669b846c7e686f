"""Probe-gate harness logic (scripts/probe_gate.py) — the committed
form of the recorded measurement protocol (BASELINE.md).  Probes are
monkeypatched so no test burns real CPU-seconds."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import probe_gate as pg  # noqa: E402


def _patch_probes(monkeypatch, singles, multis=None):
    """Route both probe families through supplied wall sequences; the
    multi probe defaults to always-healthy so single-probe scenarios
    stay unchanged."""
    it = iter(singles)
    monkeypatch.setattr(pg, "probe_sec", lambda: next(it))
    mit = iter(multis) if multis is not None else None
    monkeypatch.setattr(pg, "probe_multi_sec",
                        (lambda procs=None: next(mit)) if mit
                        else (lambda procs=None: 0.5))


def _gate(**kw):
    kw.setdefault("threshold", 0.75)
    kw.setdefault("enabled", True)
    kw.setdefault("retry_sleep", 0.0)
    kw.setdefault("multi_threshold", 1.1)
    # in-process probes so monkeypatched walls are honored
    kw.setdefault("subprocess_probes", False)
    return pg.ProbeGate(**kw)


def test_disabled_gate_is_transparent(monkeypatch):
    monkeypatch.setattr(pg, "probe_sec", lambda: pytest.fail(
        "disabled gate must never probe"))
    g = _gate(enabled=False)
    result, ok = g.run(lambda att: 42, label="x")
    assert (result, ok) == (42, True)
    assert g.probes == []


def test_healthy_window_accepts_first_sample(monkeypatch):
    _patch_probes(monkeypatch, [0.4, 0.45])
    g = _gate()
    result, ok = g.run(lambda att: ("sample", att), label="x")
    assert (result, ok) == (("sample", 0), True)
    assert g.rejected == 0 and g.waited == 0
    assert g.probes == [[0.4, 0.5], [0.45, 0.5]]


def test_degraded_trailing_probe_rejects_and_retries(monkeypatch):
    # pre ok, post slow -> reject; slow carry -> wait; fresh pre ok,
    # post ok -> accept the SECOND sample
    _patch_probes(monkeypatch, [0.4, 2.0, 0.4, 0.45])
    calls = []
    g = _gate()
    result, ok = g.run(lambda att: calls.append(att) or att, label="x")
    assert ok and result == calls[-1]
    assert g.rejected == 1 and g.waited == 1
    assert len(calls) == 2


def test_slow_leading_probe_waits_without_sampling(monkeypatch):
    # degraded, degraded, healthy: two waits, zero wasted samples
    _patch_probes(monkeypatch, [2.0, 2.0, 0.4, 0.4])
    calls = []
    g = _gate()
    result, ok = g.run(lambda att: calls.append(att) or "r", label="x")
    assert ok and result == "r"
    assert g.waited == 2 and g.rejected == 0 and len(calls) == 1


def test_exhausted_retries_return_ungated_sample(monkeypatch):
    _patch_probes(monkeypatch, [9.9] * 20)
    calls = []
    g = _gate(max_retries=2)
    result, ok = g.run(lambda att: calls.append(att) or "last", label="x")
    assert not ok and result == "last"
    assert len(calls) >= 1  # degraded throughout -> still one honest sample


def test_consecutive_samples_share_boundary_probe(monkeypatch):
    # probe before / BETWEEN / after: sample 2's leading probe is
    # sample 1's trailing one, so 2 gated samples cost 3 probes
    _patch_probes(monkeypatch, [0.4, 0.45, 0.5])
    g = _gate()
    _, ok1 = g.run(lambda att: 1, label="a")
    _, ok2 = g.run(lambda att: 2, label="b")
    assert ok1 and ok2
    assert g.probes == [[0.4, 0.5], [0.45, 0.5], [0.5, 0.5]]


def test_real_probe_returns_positive_wall():
    assert pg.probe_sec() > 0.0


def test_multi_core_contention_rejects_sample(monkeypatch):
    # single-core probe healthy BOTH times, but the all-cores probe
    # reads contended on the trailing bracket -> sample rejected, then
    # the next attempt's brackets are clean -> accepted (the 2026-08-17
    # scenario: probe 0.43s while load-avg 10.9 slowed Spark 1.5x)
    _patch_probes(monkeypatch, [0.4, 0.4, 0.4, 0.4],
                  multis=[0.8, 2.4, 0.8, 0.9])
    calls = []
    g = _gate()
    result, ok = g.run(lambda att: calls.append(att) or att, label="x")
    assert ok and len(calls) == 2 and result == calls[-1]
    assert g.rejected == 1


def test_telemetry_shape():
    g = _gate()
    t = g.telemetry()
    assert set(t) == {"enabled", "threshold_sec", "multi_threshold_sec",
                      "rejected_samples", "waited_attempts", "probe_walls",
                      "mid_run_load_excess", "samples"}


def test_subprocess_probe_pair_measures_host():
    """The default gate probes in a fresh interpreter (a hot
    JVM-attached driver inflates in-process probes); the subprocess
    path must return both walls as positive floats."""
    single, multi = pg.probe_pair_subprocess()
    assert single > 0.0 and multi > 0.0


def test_mid_run_load_excess_rejects_sample(monkeypatch):
    """Bracketing probes are point samples; the loadavg monitor must
    reject a sample whose mid-run load exceeded the job's own expected
    contribution even when both brackets are healthy."""
    _patch_probes(monkeypatch, [0.4] * 8)
    # warmup=0 monitor with a spiking loadavg, then a quiet retry
    loads = iter([12.0, 4.1, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0])
    monkeypatch.setattr(pg.os, "getloadavg",
                        lambda: (next(loads, 4.0), 0.0, 0.0))
    monkeypatch.setattr(
        pg, "_start_load_monitor",
        lambda exp, peak, interval=20.0, warmup=120.0: (
            peak.__setitem__(0, max(peak[0],
                                    pg.os.getloadavg()[0] - exp))
            or (lambda: None)))
    calls = []
    g = _gate()
    result, ok = g.run(lambda att: calls.append(att) or att, label="x",
                       expected_load=4.0)
    assert ok and len(calls) == 2          # first sample rejected on load
    assert g.rejected == 1
    assert g.load_excess[0] == 8.0         # 12.0 observed - 4.0 expected


def test_load_monitor_thread_records_peak_excess(monkeypatch):
    """The real monitor thread (warmup skipped) records the peak."""
    import time as _t

    monkeypatch.setattr(pg.os, "getloadavg", lambda: (9.5, 0.0, 0.0))
    peak = [0.0]
    stop = pg._start_load_monitor(4.0, peak, interval=0.01, warmup=0.0)
    _t.sleep(0.1)
    stop()
    assert abs(peak[0] - 5.5) < 1e-9

def test_per_sample_attribution_records(monkeypatch):
    """Every fn() invocation leaves one machine-readable record:
    (label, attempt, wall, accepted) — so a bench headline can be
    attributed to a specific gated sample without the stderr tail
    (round-4 verdict, 'What's wrong #2')."""
    # sample 1: pre ok, post slow -> rejected; retry accepted
    _patch_probes(monkeypatch, [0.4, 2.0, 0.4, 0.45])
    g = _gate()
    result, ok = g.run(lambda att: 3.14159, label="x")
    assert ok
    assert g.telemetry()["samples"] == [
        {"label": "x", "attempt": 0, "accepted": False, "wall": 3.142},
        {"label": "x", "attempt": 2, "accepted": True, "wall": 3.142},
    ]


def test_nonnumeric_sample_records_null_wall(monkeypatch):
    _patch_probes(monkeypatch, [0.4, 0.45])
    g = _gate()
    g.run(lambda att: ("tuple", att), label="x")
    [s] = g.telemetry()["samples"]
    assert s["wall"] is None and s["accepted"]


def test_stale_carry_expires(monkeypatch):
    """A trailing probe carried across gate.run() calls expires after
    carry_max_age: minutes of un-probed work may run between calls
    (bench.py's full query pass), so a minutes-old verdict says
    nothing about the current window (round-4 ADVICE)."""
    _patch_probes(monkeypatch, [0.4, 0.45, 0.5, 0.5])
    fake_now = [1000.0]
    monkeypatch.setattr(pg.time, "monotonic", lambda: fake_now[0])
    g = _gate(carry_max_age=60.0)
    _, ok1 = g.run(lambda att: 1, label="a")
    fake_now[0] += 300.0  # five minutes of query-pass work
    _, ok2 = g.run(lambda att: 2, label="b")
    assert ok1 and ok2
    # the stale carry was dropped: run 2 took a FRESH leading probe,
    # so 2 samples cost 4 probes, not the shared-boundary 3
    assert len(g.probes) == 4

def test_dict_sample_records_wall_sec(monkeypatch):
    """scaling_bench's fn returns a submit() result dict — the sample
    record pulls wall_sec out of it so scaling telemetry is attributable
    the same way bench.py's numeric walls are."""
    _patch_probes(monkeypatch, [0.4, 0.45])
    g = _gate()
    g.run(lambda att: {"wall_sec": 195.207, "n_spans": 1}, label="s")
    [s] = g.telemetry()["samples"]
    assert s["wall"] == 195.207 and s["accepted"]
