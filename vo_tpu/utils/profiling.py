"""Tracing / profiling / structured metrics.

The reference's entire observability story is a console pretty_print every
100 frames (VO.m:261-277) and figure dumps (SURVEY §5). Here:

- ``StageTimer``   — named wall-clock accumulators around pipeline stages
  (host-side; device work is closed with block_until_ready by the caller).
- ``MetricsLog``   — per-frame structured JSONL (ATE terms, inlier ratio,
  track count, ms/frame) for offline analysis and dashboards.
- ``trace``        — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace.
- ``pretty_frame`` — the reference's console block (frame #, distance step,
  velocity km/h, pose translation) for parity.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: dict(
                total_s=round(self.totals[k], 4),
                calls=self.counts[k],
                mean_ms=round(1000.0 * self.totals[k] / max(self.counts[k], 1), 3),
            )
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        rows = [f"{k:>24s}  {v['mean_ms']:8.2f} ms x{v['calls']}" for k, v in self.summary().items()]
        return "\n".join(rows)


class MetricsLog:
    """Append-only JSONL of per-frame metric dicts."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._f = open(path, "a") if path else None
        self.rows: list = []

    def log(self, frame: int, **metrics):
        row = dict(frame=frame, **{k: _jsonable(v) for k, v in metrics.items()})
        self.rows.append(row)
        if self._f:
            self._f.write(json.dumps(row) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


def _jsonable(v):
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler; view with TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def pretty_frame(frame_idx: int, rel_pose: np.ndarray, pose: np.ndarray, dt: float) -> str:
    """Console telemetry block matching pretty_print (VO.m:261-277)."""
    step = float(np.linalg.norm(rel_pose[:3, 3]))
    vel_kmh = 3.6 * step / dt if dt > 0 else 0.0
    t = pose[:3, 3]
    return (
        f"frame {frame_idx}\n"
        f"  distance since last frame: {step:.3f} m\n"
        f"  velocity: {vel_kmh:.1f} km/h\n"
        f"  position: x={t[0]:.2f} y={t[1]:.2f} z={t[2]:.2f}"
    )
