"""Metrics/observability subsystem tests."""

import json
import os

import numpy as np

from gennet_tpu.train.metrics import MetricLogger, profile_trace


def test_metric_logger_roundtrip(tmp_path):
    log = MetricLogger(str(tmp_path), "t")
    log.log(1, {"d_loss": 0.5, "d_acc": 0.9})
    log.log(2, {"d_loss": 0.4, "d_acc": 0.95})
    arrays = log.arrays()
    np.testing.assert_allclose(arrays["d_loss"], [0.5, 0.4])
    line = log.status_line(2, {"d_loss": 0.4, "d_acc": 0.95, "g_loss": 1.0, "g_acc": 0.1}, sps=10.0)
    assert line.startswith("2:") and "sD loss" in line and "steps/s" in line
    log.close()
    rows = [json.loads(l) for l in open(tmp_path / "t_metrics.jsonl")]
    assert rows[0]["d_loss"] == 0.5 and rows[1]["step"] == 2


def test_steps_per_sec_monotonic_window():
    log = MetricLogger()
    log.steps_per_sec(0)
    sps = log.steps_per_sec(100)
    assert sps > 0


def test_profile_trace_writes_artifacts(tmp_path):
    import jax
    import jax.numpy as jnp

    with profile_trace(str(tmp_path)):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    found = []
    for root, dirs, files in os.walk(tmp_path):
        found += files
    assert found, "profiler produced no trace files"
