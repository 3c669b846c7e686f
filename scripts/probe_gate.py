#!/usr/bin/env python3
"""CPU probe gate — the measurement-governance harness
behind the recorded 0.877 scaling-efficiency / 1577 docs/s sustained
numbers (BASELINE.md), committed so that protocol is reproducible from
the repo rather than described in prose (round-3 verdict, "What's
missing #3").

This host is a shared VM with minutes-long co-tenant degradation
windows (documented in BASELINE.md: thread dumps show executor threads
crawling through native calls; identical queries spread up to 10×
across repetitions).  A sample taken inside such a window measures the
neighbors, not the code.  The gate brackets every measured sample with
two probes — a **single-core** 10⁷-iteration Python add loop (~0.4s
healthy; ``PROBE_THRESHOLD_SEC``, default 0.75) and an **all-cores**
variant (one such burn per core, in parallel;
``PROBE_MULTI_THRESHOLD_SEC``, default 1.25) that catches the
co-tenant multi-core contention the single-core probe provably misses
— and accepts the sample only when BOTH bracketing probe pairs pass.  Consecutive samples share
the boundary probe (probe *before / between / after* the runs),
exactly the recorded campaign's shape — but a carried probe verdict
expires after ``carry_max_age`` seconds (default 60), because a probe
taken minutes ago says nothing about the current window; a rejected
sample is retried up to ``max_retries`` times, its trailing probe
serving as the next attempt's leading probe while fresh.

``bench.py`` enables the gate BY DEFAULT (its own env default is
``SCALING_PROBE_GATE=1``; set 0 to opt out);
``scripts/scaling_bench.py`` still requires an explicit
``SCALING_PROBE_GATE=1``.  When disabled the gate is a transparent
no-op, so un-gated runs behave exactly as before.
"""

from __future__ import annotations

import os
import sys
import time

PROBE_ADDS = 10_000_000
DEFAULT_THRESHOLD = float(os.environ.get("PROBE_THRESHOLD_SEC", "0.75"))
# Multi-core probe: the single-core probe misses CO-TENANT MULTI-CORE
# contention entirely — measured on 2026-08-17: probe 0.43s (healthy)
# while load-avg sat at 10.9 from neighbors and 32-thread Spark jobs
# ran ~1.5× slow.  An all-cores probe (one 10⁷-add burn per core, in
# parallel) reads ~0.7-0.9s when the machine is actually free and
# 1.3-2.4s under that contention, so both probes must pass.
DEFAULT_MULTI_THRESHOLD = float(
    os.environ.get("PROBE_MULTI_THRESHOLD_SEC", "1.25"))
MULTI_PROCS = min(32, os.cpu_count() or 8)


def gate_enabled() -> bool:
    return os.environ.get("SCALING_PROBE_GATE", "0") == "1"


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i
    return s


def probe_sec() -> float:
    """Wall seconds for 10⁷ single-core Python integer adds."""
    t0 = time.perf_counter()
    s = _burn(PROBE_ADDS)
    elapsed = time.perf_counter() - t0
    assert s == PROBE_ADDS * (PROBE_ADDS - 1) // 2
    return elapsed


def probe_multi_sec(procs: int = MULTI_PROCS) -> float:
    """Wall seconds for *procs* concurrent 10⁷-add burns (one process
    per core): ≈ the single-core wall plus fork overhead when the
    machine is free, stretched by whatever fraction of the cores the
    co-tenants currently hold."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        pool.map(_burn, [PROBE_ADDS] * procs)
    return time.perf_counter() - t0


def probe_pair_subprocess() -> tuple[float, float]:
    """Both probe walls, measured in a FRESH interpreter.

    Probing in-process from a benchmark driver is biased: a hot Spark
    driver's JVM companion threads and allocator state inflate even the
    single-core probe (measured 0.76-1.32s in-process vs 0.43s
    standalone in the same minute), so an in-process gate rejects
    healthy windows.  A clean subprocess measures the HOST."""
    import json as _json
    import subprocess as _sp

    out = _sp.run([sys.executable, os.path.abspath(__file__), "--json"],
                  capture_output=True, text=True, timeout=300)
    d = _json.loads(out.stdout.strip().splitlines()[-1])
    return float(d["single"]), float(d["multi"])


def _start_load_monitor(expected_load: float, peak_excess: list,
                        interval: float = 20.0, warmup: float = 120.0):
    """Background thread recording peak 1-min loadavg excess over the
    measured job's own expected contribution.  Reading loadavg costs
    nothing, so unlike a mid-run CPU probe it cannot perturb the
    sample.  The first ``warmup`` seconds are skipped: 1-min loadavg
    decays exponentially, so readings right after the PREVIOUS heavy
    run would bill its residue to this sample (runs shorter than the
    warmup get no readings and rely on their brackets, which are
    strong for short samples anyway).  Returns a stop() callable."""
    import threading

    stop_evt = threading.Event()

    def monitor():
        stop_evt.wait(warmup)
        while not stop_evt.is_set():
            excess = os.getloadavg()[0] - expected_load
            if excess > peak_excess[0]:
                peak_excess[0] = excess
            stop_evt.wait(interval)

    t = threading.Thread(target=monitor, daemon=True)
    t.start()

    def stop():
        stop_evt.set()
        t.join(timeout=5)

    return stop


class ProbeGate:
    """Bracketing probe gate around measured samples.

    ``run(fn, label)`` calls ``fn(attempt)`` with a leading and a
    trailing probe; the sample is accepted iff both probes beat the
    threshold.  ``fn`` receives the 0-based attempt number so callers
    can derive per-attempt scratch paths.  Returns ``(result,
    accepted)`` — after ``max_retries`` rejections the last result is
    returned with ``accepted=False`` so the caller can record the
    degradation honestly instead of hanging forever.
    """

    def __init__(self, threshold: float | None = None,
                 max_retries: int = 4, enabled: bool | None = None,
                 retry_sleep: float = 15.0,
                 multi_threshold: float | None = None,
                 subprocess_probes: bool = True,
                 carry_max_age: float = 60.0):
        self.threshold = DEFAULT_THRESHOLD if threshold is None else threshold
        self.multi_threshold = (DEFAULT_MULTI_THRESHOLD
                                if multi_threshold is None
                                else multi_threshold)
        self.max_retries = max_retries
        self.enabled = gate_enabled() if enabled is None else enabled
        self.retry_sleep = retry_sleep
        # default True: probe in a fresh interpreter so the gate reads
        # the HOST, not the caller's hot JVM-attached driver process
        # (see probe_pair_subprocess)
        self.subprocess_probes = subprocess_probes
        # carried trailing probes expire: when minutes of un-probed work
        # run between gate.run() calls (bench.py runs the full query
        # pass between extraction reps), last rep's trailing probe says
        # nothing about the current window, so a stale carry is dropped
        # and a fresh leading probe taken
        self.carry_max_age = carry_max_age
        self.rejected = 0          # samples thrown away
        self.waited = 0            # attempts spent waiting, no sample taken
        self.probes: list[list[float]] = []  # [single, multi] walls in order
        self.load_excess: list[float] = []  # peak mid-run loadavg excess
        # one record per fn() invocation: which wall was measured, on
        # which attempt, and whether its brackets accepted it — so a
        # published headline is attributable to a specific gated sample
        # without reading the stderr tail
        self.samples: list[dict] = []
        self._carry: tuple[float, float] | None = None  # (wall, taken_at)

    def _probe(self) -> float:
        """One bracketing probe: single-core AND all-cores walls.
        Returns the worse of the two, each normalized to its own
        threshold and scaled back to the single-core scale, so the
        existing accept logic (`<= self.threshold`) sees a breach of
        EITHER threshold."""
        if self.subprocess_probes:
            single, multi = probe_pair_subprocess()
        else:
            single, multi = probe_sec(), probe_multi_sec()
        self.probes.append([round(single, 3), round(multi, 3)])
        return max(single, multi * self.threshold / self.multi_threshold)

    def run(self, fn, label: str = "", expected_load: float | None = None):
        """``expected_load``: the measured job's own expected 1-min
        load-average contribution (e.g. its core count + a couple of
        JVM helper threads).  When set, a zero-perturbation monitor
        thread samples ``os.getloadavg()`` during the run and the
        sample is rejected if the excess over ``expected_load`` ever
        passes ``PROBE_LOAD_TOLERANCE`` (default 4.0) — bracketing
        probes are point samples and a minutes-long run can degrade
        mid-flight between two healthy brackets (measured: a 55-min
        192k campaign lost ~20% per-doc throughput to co-tenant bursts
        its brackets never saw)."""
        if not self.enabled:
            return fn(0), True

        def record(result, accepted: bool, attempt: int) -> None:
            wall = result
            if isinstance(result, dict):  # scaling_bench submit() dicts
                wall = result.get("wall_sec")
            self.samples.append({
                "label": label, "attempt": attempt, "accepted": accepted,
                "wall": (round(float(wall), 3)
                         if isinstance(wall, (int, float)) else None)})

        tolerance = float(os.environ.get("PROBE_LOAD_TOLERANCE", "4.0"))
        result, have_result = None, False
        for attempt in range(self.max_retries + 1):
            if (self._carry is not None
                    and time.monotonic() - self._carry[1] > self.carry_max_age):
                self._carry = None  # stale — doesn't describe this window
            pre = (self._carry[0] if self._carry is not None
                   else self._probe())
            self._carry = None
            if pre > self.threshold and attempt < self.max_retries:
                # the window is degraded RIGHT NOW — wait it out instead
                # of burning a minutes-long sample that must be rejected
                self.waited += 1
                print(f"[probe-gate] {label}: host degraded "
                      f"(probe {pre:.2f}s > {self.threshold}s) — waiting "
                      f"{self.retry_sleep:.0f}s before sampling",
                      file=sys.stderr)
                time.sleep(self.retry_sleep)
                continue
            peak_excess = [0.0]
            stop_monitor = None
            if expected_load is not None:
                stop_monitor = _start_load_monitor(expected_load,
                                                   peak_excess)
            try:
                result, have_result = fn(attempt), True
            finally:
                if stop_monitor is not None:
                    stop_monitor()
            self.load_excess.append(round(peak_excess[0], 2))
            post = self._probe()
            self._carry = (post, time.monotonic())
            mid_ok = peak_excess[0] <= tolerance
            if pre <= self.threshold and post <= self.threshold and mid_ok:
                record(result, True, attempt)
                return result, True
            record(result, False, attempt)
            self.rejected += 1
            why = (f"mid-run load excess {peak_excess[0]:.1f} > "
                   f"{tolerance}" if not mid_ok else
                   f"probes {pre:.2f}s/{post:.2f}s vs {self.threshold}s")
            print(f"[probe-gate] {label}: sample rejected ({why}, "
                  f"attempt {attempt + 1})", file=sys.stderr)
        if not have_result:  # every attempt waited — sample once, ungated
            result = fn(self.max_retries)
            record(result, False, self.max_retries)
        print(f"[probe-gate] {label}: retries exhausted — recording the "
              "last sample as UNGATED (host degraded throughout)",
              file=sys.stderr)
        return result, False

    def telemetry(self) -> dict:
        return {"enabled": self.enabled, "threshold_sec": self.threshold,
                "multi_threshold_sec": self.multi_threshold,
                "rejected_samples": self.rejected,
                "waited_attempts": self.waited,
                "probe_walls": self.probes,
                "mid_run_load_excess": self.load_excess,
                "samples": self.samples}


if __name__ == "__main__":
    # standalone host-health check: print both probe walls and exit 0/1
    # (--json prints machine-readable output for probe_pair_subprocess)
    p, m = probe_sec(), probe_multi_sec()
    if "--json" in sys.argv:
        import json as _json
        print(_json.dumps({"single": round(p, 3), "multi": round(m, 3)}))
    else:
        print(f"probe: single {p:.3f}s (threshold {DEFAULT_THRESHOLD}s), "
              f"multi[{MULTI_PROCS}] {m:.3f}s "
              f"(threshold {DEFAULT_MULTI_THRESHOLD}s)")
    sys.exit(0 if p <= DEFAULT_THRESHOLD
             and m <= DEFAULT_MULTI_THRESHOLD else 1)
