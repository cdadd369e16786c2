"""Device-health probing (gennet_tpu/runtime/health.py)."""

from gennet_tpu.runtime import health


def test_probe_once_passes_on_cpu(monkeypatch):
    # tests force JAX_PLATFORMS=cpu (conftest), and the probe snippet
    # re-applies the env var via jax.config — so a real fresh-process probe
    # must pass on the CPU backend regardless of sitecustomize pinning
    assert health.probe_once(timeout_s=120)


def test_wait_device_healthy_cools_off_then_succeeds(monkeypatch):
    calls = {"n": 0}

    def fake_probe(timeout_s=90):
        calls["n"] += 1
        return calls["n"] >= 3

    sleeps = []
    monkeypatch.setattr(health, "probe_once", fake_probe)
    monkeypatch.setattr(health.time, "sleep", sleeps.append)
    msgs = []
    assert health.wait_device_healthy(max_wait=1e9, cooloff=7, log=msgs.append)
    assert calls["n"] == 3 and sleeps == [7, 7]
    assert any("healthy" in m for m in msgs)


def test_wait_device_healthy_gives_up_at_max_wait(monkeypatch):
    monkeypatch.setattr(health, "probe_once", lambda timeout_s=90: False)
    t = {"now": 0.0}
    monkeypatch.setattr(health.time, "time", lambda: t["now"])

    def advance(s):
        t["now"] += s

    monkeypatch.setattr(health.time, "sleep", advance)
    msgs = []
    assert not health.wait_device_healthy(max_wait=120, cooloff=60,
                                          log=msgs.append)
    assert any("still unhealthy" in m for m in msgs)
