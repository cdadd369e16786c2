"""Metrics logging and observability.

Replaces the reference's printf-style status lines (ref:
bbhMahoGANy.py:1190,1303-1305) with a structured history that the plotting
suite regenerates dashboards from, plus steps/sec + templates/sec meters and
optional jax.profiler traces (SURVEY.md §5.1/§5.5 build plan).
"""

import json
import os
import time
from collections import defaultdict

import numpy as np


class MetricLogger:
    """Accumulates per-step metric dicts; prints reference-style status
    lines at a cadence; persists to jsonl; computes steps/sec."""

    def __init__(self, out_dir: str | None = None, name: str = "train"):
        self.history = defaultdict(list)
        self._t0 = time.perf_counter()
        self._last = self._t0
        self._last_step = 0
        self.out_dir = out_dir
        self._fh = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, f"{name}_metrics.jsonl"), "a")

    def log(self, step: int, metrics: dict):
        row = {k: float(v) for k, v in metrics.items()}
        row["step"] = step
        for k, v in row.items():
            self.history[k].append(v)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()

    def steps_per_sec(self, step: int) -> float:
        now = time.perf_counter()
        ds = step - self._last_step
        dt = now - self._last
        self._last, self._last_step = now, step
        return ds / dt if dt > 0 else float("nan")

    def status_line(self, step: int, metrics: dict, sps: float | None = None) -> str:
        """Reference-style: '123: [sD loss: x, acc: y]  [sG loss: ..]'
        (ref: bbhMahoGANy.py:1303-1305), extended with steps/sec."""
        parts = [f"{step}:"]
        if "d_loss" in metrics:
            parts.append(f"[sD loss: {float(metrics['d_loss']):f}, acc: {float(metrics.get('d_acc', 0)):f}]")
        if "g_loss" in metrics:
            parts.append(f"[sG loss: {float(metrics['g_loss']):f}, acc: {float(metrics.get('g_acc', 0)):f}]")
        if "res_loss" in metrics and float(metrics.get("res_loss", 0)) != 0:
            parts.append(f"[nG loss: {float(metrics['res_loss']):f}]")
        if "pe_loss" in metrics:
            parts.append(f"[PE loss: {float(metrics['pe_loss']):f}]")
        if sps is not None:
            parts.append(f"[{sps:.1f} steps/s]")
        return "  ".join(parts)

    def arrays(self) -> dict:
        return {k: np.asarray(v) for k, v in self.history.items()}

    def close(self):
        if self._fh:
            self._fh.close()


def fetch_metrics(metrics: dict) -> dict:
    """One batched device→host transfer for a metric dict.

    ``float(metrics[k])`` per key costs one device round-trip each; over a
    remote-TPU transport that serializes ~10 round-trips into device idle
    time at every logging cadence (measured r5 flagship: 94 steps/s in-run
    vs 211 for the pure fused loop — the gap is host-side logging).
    ``jax.device_get`` on the whole dict is a single transfer; callers
    combine it with deferred (one-chunk-late) flushing so the transfer and
    the jsonl/stdout work overlap the device's next chunk.
    """
    import jax

    return {k: float(v) for k, v in jax.device_get(metrics).items()}


def profile_trace(out_dir: str):
    """Context manager producing a jax.profiler trace viewable in
    TensorBoard/Perfetto (SURVEY.md §5.1: the reference imported TensorBoard
    in four scripts but never instantiated it)."""
    import jax

    class _Trace:
        def __enter__(self):
            jax.profiler.start_trace(out_dir)
            return self

        def __exit__(self, *a):
            jax.profiler.stop_trace()

    return _Trace()


def debug_nans(enable: bool = True):
    """Numerical-sanitizer mode (SURVEY.md §5.2 build plan): make XLA raise
    on NaN-producing ops."""
    import jax

    jax.config.update("jax_debug_nans", enable)
