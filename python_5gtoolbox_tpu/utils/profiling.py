"""Tracing / profiling / observability (SURVEY.md section 5.1/5.5).

The reference has only commented-out time.time() probes and print()s;
the framework obligation is proper per-stage timing with throughput
counters (samples/s, codewords/s, slots/s) plus on-demand XLA profiler
traces. Host-side and dependency-free: safe to leave enabled in sims.

Usage:
    prof = StageProfiler()
    with prof.stage("ldpc_decode", items=B, unit="cw"):
        bits, ok, _ = ldpc_decode(...)
        bits.block_until_ready()
    print(prof.report())

    with xla_trace("/tmp/trace"):   # opens in xprof/tensorboard
        step(x).block_until_ready()
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class _StageStats:
    calls: int = 0
    seconds: float = 0.0
    items: float = 0.0
    unit: str = "items"


@dataclass
class StageProfiler:
    """Accumulates wall time + item counts per named pipeline stage."""

    stats: dict = field(default_factory=lambda: defaultdict(_StageStats))

    @contextlib.contextmanager
    def stage(self, name: str, items: float = 0.0, unit: str = "items"):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            s = self.stats[name]
            s.calls += 1
            s.seconds += time.perf_counter() - t0
            s.items += items
            s.unit = unit

    def rate(self, name: str) -> float:
        s = self.stats[name]
        return s.items / s.seconds if s.seconds else 0.0

    def report(self) -> str:
        lines = [f"{'stage':24s} {'calls':>6s} {'total_s':>9s} "
                 f"{'per_call_ms':>12s} {'throughput':>18s}"]
        for name, s in sorted(self.stats.items()):
            thr = (f"{self.rate(name):,.0f} {s.unit}/s" if s.items
                   else "-")
            lines.append(
                f"{name:24s} {s.calls:6d} {s.seconds:9.3f} "
                f"{1e3 * s.seconds / max(s.calls, 1):12.2f} {thr:>18s}")
        return "\n".join(lines)

    def reset(self) -> None:
        self.stats.clear()

    # stages that dispatch once per slot (the "latency" profile shape);
    # on the tunneled accelerator each such dispatch costs ~0.65 ms of
    # pure round-trip, so a long per-slot loop there is a misroute
    PER_SLOT_STAGES = ("rx_process[", "channel_est")

    def check_dispatch_routing(self, limit: int = 32,
                               backend: str | None = None) -> list:
        """Warn when per-slot stages ran >limit times on an accelerator
        backend (platform-routing guard, VERDICT r4 item 9: per-slot
        paths belong on the "latency" CPU profile —
        utils/platform.select_platform). Returns the offender list
        [(stage, calls), ...]; emits a warnings.warn for each.
        """
        import warnings

        if backend is None:
            import jax

            backend = jax.default_backend()
        if backend == "cpu":
            return []
        offenders = [(n, s.calls) for n, s in self.stats.items()
                     if any(n.startswith(p) for p in self.PER_SLOT_STAGES)
                     and s.calls > limit]
        for name, calls in offenders:
            warnings.warn(
                f"per-slot stage '{name}' dispatched {calls} times on "
                f"the '{backend}' backend (> {limit}); this path is "
                f"latency-profile work — route it through "
                f"select_platform('latency') or the batched RX",
                RuntimeWarning, stacklevel=2)
        return offenders


@contextlib.contextmanager
def xla_trace(logdir: str):
    """jax.profiler trace scope (view with xprof / tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
