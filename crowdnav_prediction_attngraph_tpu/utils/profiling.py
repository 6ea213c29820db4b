"""Tracing/profiling utilities (SURVEY.md section 5: the reference only logs
wall-clock FPS, train.py:222-232; the TPU build adds real tracing).

- ``phase_timer``: per-phase wall-clock with device sync, accumulated into a
  report (rollout / gae / update / eval phases).
- ``trace``: context manager around jax.profiler for TensorBoard-viewable
  device traces.
- ``counters``: derived throughput numbers (env-steps/s, edges/s).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:>16}: {total:8.3f}s total, "
                         f"{total / max(n, 1) * 1e3:8.2f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Device trace for TensorBoard (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def env_steps_per_s(num_envs: int, num_steps: int, seconds: float) -> float:
    return num_envs * num_steps / seconds


def edges_per_s(rows: int, num_agents: int, seconds: float) -> float:
    """Interaction-graph edge throughput of one attention pass."""
    return rows * num_agents * num_agents / seconds
