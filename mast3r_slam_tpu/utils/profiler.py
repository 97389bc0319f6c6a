"""Section-timing profiler.

Capability parity with `/root/reference/mast3r_slam/profiler.py` (global
TimeProfiler with device-synchronized context timers and a summary report
splitting network vs BA time).  Differences for TPU:

* disabled by default — synchronizing the device per section would defeat
  JAX async dispatch; enable with ``profiler.enable()`` (mirrors the
  reference always-on cuda.synchronize timers);
* integrates with the JAX trace profiler: ``profiler.jax_trace(logdir)``
  wraps a block in ``jax.profiler.trace`` for XLA-level timelines.

Section names keep the reference taxonomy (vit_encode, decoder, ba_rays,
ba_calib, ...) so reports are comparable.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class TimeProfiler:
    def __init__(self):
        self.enabled = False
        self.times = defaultdict(float)
        self.counts = defaultdict(int)

    def enable(self):
        self.enabled = True

    def disable(self):
        self.enabled = False

    def reset(self):
        self.times.clear()
        self.counts.clear()

    @contextlib.contextmanager
    def timer(self, name: str):
        if not self.enabled:
            yield
            return
        import jax

        (jax.device_put(0.0) + 0).block_until_ready()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # flush async dispatch so the section owns its device time
            (jax.device_put(0.0) + 0).block_until_ready()
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    @contextlib.contextmanager
    def jax_trace(self, logdir: str):
        import jax

        with jax.profiler.trace(logdir):
            yield

    def get_stats(self):
        return {
            k: {"total_s": self.times[k], "count": self.counts[k],
                "mean_ms": 1e3 * self.times[k] / max(self.counts[k], 1)}
            for k in self.times
        }

    def merge_stats(self, stats: dict):
        for k, v in stats.items():
            self.times[k] += v["total_s"]
            self.counts[k] += v["count"]

    def print_summary(self):
        """Reference-style report (profiler.py:37-110): network split vs BA
        time."""
        if not self.times:
            print("[profiler] no sections recorded (profiler disabled?)")
            return
        stats = self.get_stats()
        total = sum(v["total_s"] for v in stats.values())
        print("=" * 64)
        print(f"{'section':<24}{'count':>8}{'mean ms':>12}{'total s':>10}"
              f"{'share':>8}")
        print("-" * 64)
        for k in sorted(stats, key=lambda k: -stats[k]["total_s"]):
            v = stats[k]
            print(f"{k:<24}{v['count']:>8}{v['mean_ms']:>12.2f}"
                  f"{v['total_s']:>10.3f}{v['total_s'] / total:>8.1%}")
        net = sum(stats.get(k, {"total_s": 0})["total_s"]
                  for k in ("vit_encode", "decoder"))
        ba = sum(stats.get(k, {"total_s": 0})["total_s"]
                 for k in ("ba_rays", "ba_calib"))
        print("-" * 64)
        print(f"network (encode+decode): {net:.3f}s | BA: {ba:.3f}s | "
              f"total: {total:.3f}s")
        print("=" * 64)


profiler = TimeProfiler()


# ---------------------------------------------------------------------------
# tic/toc convenience (reference mast3r_slam/tictoc.py:4-31 — CUDA-event
# timers there; here host timers around explicitly synchronized sections)
# ---------------------------------------------------------------------------

_tic_stack: list = []


def tic():
    import time

    _tic_stack.append(time.perf_counter())


def toc(msg: str = "") -> float:
    import time

    dt = time.perf_counter() - _tic_stack.pop()
    if msg:
        print(f"{msg}: {dt * 1e3:.2f} ms")
    return dt
