"""Time the flagship GAN train step under conv_impl 'xla' vs 'pallas'.

Decides whether the Pallas conv1d kernel (gennet_tpu/ops/pallas_conv1d.py)
is the TPU default for the model hot layers or a documented non-goal
(VERDICT r1 item 5: build the kernel and show a win, or prove XLA convs
are at roofline). Run on the TPU when the chip is free:

    python scripts/bench_conv_impl.py [batch] [scan]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gennet_tpu.models import BBHGenerator, PairDiscriminator
from gennet_tpu.train import GANConfig, init_gan
from gennet_tpu.train import gan as gan_mod

PEAK_FLOPS = 197e12  # v5e per-chip MXU peak (see bench.py)


def time_impl(impl: str, batch: int, scan: int):
    cfg = GANConfig(n_pix=1024, batch_size=batch, pair_discriminator=True,
                    label_smoothing=True, d_instance_noise=0.3, d_lr_scale=0.5,
                    d_acc_gate=0.9)
    G = BBHGenerator(n_out=cfg.n_pix, conv_impl=impl)
    D = PairDiscriminator(conv_impl=impl)
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank = jax.random.normal(jax.random.PRNGKey(1), (4096, cfg.n_pix))
    measured = jax.random.normal(jax.random.PRNGKey(2), (cfg.n_pix,))

    flops = None
    try:
        knobs = gan_mod.knobs_from_cfg(cfg)
        single = jax.jit(partial(gan_mod.gan_step, generator=G,
                                 discriminator=D, cfg=cfg))
        ca = single.lower(state, bank, measured, jax.random.PRNGKey(3),
                          knobs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # pallas custom calls may lack cost analysis
        print(f"[{impl}] cost_analysis unavailable: {e}")

    import numpy as np

    step = gan_mod.make_gan_step_scan(G, D, cfg, scan)
    key = jax.random.PRNGKey(4)
    t0 = time.perf_counter()
    state, m = step(state, bank, measured, key)
    float(np.asarray(m["d_loss"])[-1])   # host transfer: forces REMOTE completion
    print(f"[{impl}] compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    reps = max(1, 1000 // scan)
    t0 = time.perf_counter()
    for _ in range(reps):
        key, sub = jax.random.split(key)
        state, m = step(state, bank, measured, sub)
    float(np.asarray(m["d_loss"])[-1])   # ditto — block_until_ready on this
                                         # backend only waits for the local
                                         # handle, not remote execution
    dt = time.perf_counter() - t0
    sps = reps * scan / dt
    row = {"impl": impl, "batch": batch, "steps_per_sec": round(sps, 2)}
    if flops:
        row["mfu"] = round(flops * sps / PEAK_FLOPS, 4)
    print(row, flush=True)
    return row


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scan = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    for impl in ("xla", "pallas"):
        time_impl(impl, batch, scan)


if __name__ == "__main__":
    main()
