"""Headline benchmark: whitened BBH template synthesis throughput.

Runs the fused on-device bank pipeline (gennet_tpu.data.template_bank) on
the available accelerator and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/target}

Baseline target: 1e5 whitened templates/sec on v5e-8 (BASELINE.md). The
reference generates templates in a serial host loop with one lalsimulation C
call + two FFT whitens per template (ref: gw_template_maker.py:676-698) at
O(1-10)/s; vs_baseline is measured against the driver's 1e5/s target, not
the reference's host loop.
"""

import json
import time

import jax

TARGET = 1e5  # templates/sec (BASELINE.json:5, v5e-8)


def main():
    from gennet_tpu import runtime

    runtime.setup()

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
        run = lambda k: tb.make_bank_sharded(k, per_dev * n_dev, psd, mesh, cfg)[0]
    else:
        run = lambda k: tb.make_template_batch(k, per_dev, psd, cfg)[0]

    # compile + warmup
    t = run(key)
    t.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        t = run(sub)
    t.block_until_ready()
    dt = time.perf_counter() - t0

    rate = iters * per_dev * n_dev / dt
    print(json.dumps({
        "metric": "whitened_templates_per_sec",
        "value": round(rate, 1),
        "unit": "templates/s",
        "vs_baseline": round(rate / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
