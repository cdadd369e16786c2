"""Headline benchmark: whitened BBH template synthesis throughput + GAN
train-step throughput/MFU.

Runs the fused on-device bank pipeline (gennet_tpu.data.template_bank) and
the fused flagship GAN train step (gennet_tpu.train.gan) on the available
accelerator and prints ONE final JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/target,
     "gan_steps_per_sec": ..., "gan_achieved_tflops": ..., "gan_mfu": ...}

Baseline target: 1e5 whitened templates/sec on v5e-8 (BASELINE.md). The
reference generates templates in a serial host loop with one lalsimulation C
call + two FFT whitens per template (ref: gw_template_maker.py:676-698) at
O(1-10)/s; vs_baseline is measured against the driver's 1e5/s target, not
the reference's host loop. The GAN metric covers BASELINE.json's "GAN train
steps/sec": one full alternating iteration (D update + G update, batch 8,
n_pix 1024, the reference's schedule at bbhMahoGANy.py:86-88) with 100
iterations scan-fused per dispatch, exactly as run_bbh trains.
"""

import json
import time
from functools import partial

import jax
import numpy as np

TARGET = 1e5          # templates/sec (BASELINE.json:5, v5e-8)
PEAK_FLOPS = 197e12   # v5e per-chip bf16/MXU peak; JAX's default f32 matmul
                      # precision on TPU executes on the MXU at this rate


def _force(x) -> float:
    """Force REMOTE completion by transferring a scalar to the host.

    On the axon backend ``block_until_ready`` only waits for the local
    handle, not remote execution (measured: r2's block_until_ready timings
    reported 102x chip peak). A host transfer of a value that depends on
    the full computation is the only reliable completion barrier; TPU
    executes its dispatch queue in order, so waiting on the LAST dispatch
    also bounds every earlier one.
    """
    return float(np.asarray(x))


def bench_bank():
    from gennet_tpu.data import template_bank as tb
    from gennet_tpu.physics import psd as psd_mod

    cfg = tb.BankConfig()  # 1 s @ 1024 Hz whitened H1 templates, 4 s safe window
    psd = psd_mod.analytic_advligo_psd(cfg.fs, cfg.T_obs * cfg.safe)

    n_dev = len(jax.devices())
    per_dev = 16384
    key = jax.random.PRNGKey(0)

    if n_dev > 1:
        from gennet_tpu.train.mesh import data_mesh

        mesh = data_mesh()
        gen = lambda k: tb.make_bank_sharded(k, per_dev * n_dev, psd, mesh, cfg)[0]
    else:
        gen = lambda k: tb.make_template_batch(k, per_dev, psd, cfg)[0]

    # Reduce on device so completion is forced by a scalar transfer, not a
    # 64 MB bank pull.
    run = jax.jit(lambda k: jnp_sum(gen(k)))

    # FLOPs per template from the compiled program (for the physicality check)
    flops_per_template = None
    try:
        ca = run.lower(key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        total = float(ca.get("flops", 0.0))
        if total > 0:
            flops_per_template = total / (per_dev * n_dev)
    except Exception:
        pass

    _force(run(key))  # compile + warmup

    iters = 10
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(iters):
        key, sub = jax.random.split(key)
        s = run(sub)
    _force(s)  # completion barrier (see _force)
    dt = time.perf_counter() - t0
    rate = iters * per_dev * n_dev / dt

    if flops_per_template:
        achieved = rate * flops_per_template
        assert achieved < PEAK_FLOPS * n_dev, (
            f"bank bench reports {achieved/1e12:.1f} TFLOP/s "
            f"> {n_dev}x chip peak {PEAK_FLOPS*n_dev/1e12:.0f} — timing is broken "
            "(completion not forced?)")
    return rate, flops_per_template


def jnp_sum(x):
    import jax.numpy as jnp

    return jnp.sum(x)


def bench_gan_step():
    """Flagship GAN step throughput + MFU (achieved FLOP/s vs MXU peak)."""
    import jax.numpy as jnp

    from gennet_tpu.cli.workloads import BBHConfig
    from gennet_tpu.models import BBHGenerator, PairDiscriminator
    from gennet_tpu.train import GANConfig, init_gan
    from gennet_tpu.train import gan as gan_mod

    b = BBHConfig()  # the exact flagship training configuration
    cfg = GANConfig(n_pix=b.n_pix, batch_size=b.batch_size, lr=b.lr,
                    chi_loss=b.chi_loss, n_sig=b.n_sig, pair_discriminator=True,
                    label_smoothing=b.label_smoothing,
                    d_instance_noise=b.instance_noise, d_lr_scale=b.d_lr_scale,
                    d_acc_gate=b.d_acc_gate, diversity_weight=b.diversity_weight,
                    g_ema_decay=b.g_ema_decay)
    G, D = BBHGenerator(n_out=cfg.n_pix), PairDiscriminator()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank = jax.random.normal(jax.random.PRNGKey(1), (4096, cfg.n_pix))
    measured = jax.random.normal(jax.random.PRNGKey(2), (cfg.n_pix,))

    # FLOPs of one iteration from the compiled single-step program
    flops_per_step = None
    try:
        knobs = gan_mod.knobs_from_cfg(cfg)
        single = jax.jit(partial(gan_mod.gan_step, generator=G, discriminator=D, cfg=cfg))
        compiled = single.lower(state, bank, measured, jax.random.PRNGKey(3), knobs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    scan = 100  # matches run_bbh's cadence-fused inner loop
    step = gan_mod.make_gan_step_scan(G, D, cfg, scan)
    key = jax.random.PRNGKey(4)
    state, m = step(state, bank, measured, key)  # compile + warmup
    _force(m["d_loss"][-1])  # completion barrier (see _force)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        key, sub = jax.random.split(key)
        state, m = step(state, bank, measured, sub)
    _force(m["d_loss"][-1])  # completion barrier
    dt = time.perf_counter() - t0

    sps = reps * scan / dt
    out = {"gan_steps_per_sec": round(sps, 2)}
    if flops_per_step:
        achieved = flops_per_step * sps
        out["gan_flops_per_step"] = flops_per_step
        out["gan_achieved_tflops"] = round(achieved / 1e12, 3)
        out["gan_mfu"] = round(achieved / PEAK_FLOPS, 4)
        assert out["gan_mfu"] < 1.0, (
            f"gan_mfu={out['gan_mfu']} >= 1 is physically impossible — "
            "timing is broken (completion not forced?)")
    return out


def main():
    # The contract with the driver: this process ALWAYS ends by printing
    # exactly one JSON line, even when the device is sick or a bench stage
    # throws — a missing/null parse is strictly worse than an error row.
    row = {
        "metric": "whitened_templates_per_sec",
        "value": 0.0,
        "unit": "templates/s",
        "vs_baseline": 0.0,
    }
    try:
        # Pre-flight BEFORE any backend init in this process: the probe runs
        # in a fresh subprocess, so a wedged tunnel is detected without this
        # process becoming a stuck client itself. Fail FAST (<=120 s): the
        # driver's window is finite and an unhealthy device will not recover
        # inside it — emit the error row and exit instead of riding the wedge.
        from gennet_tpu.runtime.health import wait_device_healthy

        if not wait_device_healthy(max_wait=120,
                                   log=lambda m: print(f"[bench] {m}",
                                                       flush=True)):
            row["error"] = "device unhealthy (probe failed for 120s)"
            print(json.dumps(row), flush=True)
            return

        from gennet_tpu import runtime

        runtime.setup()

        gan = bench_gan_step()
        rate, flops_per_template = bench_bank()

        row["value"] = round(rate, 1)
        row["vs_baseline"] = round(rate / TARGET, 4)
        if flops_per_template:
            row["bank_flops_per_template"] = round(flops_per_template)
            row["bank_achieved_tflops"] = round(rate * flops_per_template / 1e12, 3)
        row.update(gan)
    except BaseException as e:  # noqa: BLE001 — the JSON line must land
        row["error"] = f"{type(e).__name__}: {e}"[:500]
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
