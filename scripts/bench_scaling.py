"""GAN train-step throughput scaling study (VERDICT r2 item 5).

Measures steps/s and MFU for the flagship GAN step over
batch {8, 64, 256} × conv impl {xla, pallas} × dtype {f32, bf16} with
forced remote completion (block_until_ready on this backend only waits for
the local handle — see bench.py). Decides the measured flagship defaults:
the reference schedule is batch 8 (ref: bbhMahoGANy.py:86-88), which is
latency/VPU-bound at MFU 0.289; larger batches amortize fixed overheads
onto the MXU.

Usage: python scripts/bench_scaling.py [scan]
Writes one JSON line per cell + a markdown table to stdout.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gennet_tpu.models import BBHGenerator, PairDiscriminator
from gennet_tpu.train import GANConfig, init_gan
from gennet_tpu.train import gan as gan_mod

PEAK_FLOPS = 197e12  # v5e per-chip MXU peak (bf16; f32 matmuls run on MXU)


def time_cell(impl: str, batch: int, dtype, scan: int):
    cfg = GANConfig(n_pix=1024, batch_size=batch, pair_discriminator=True,
                    label_smoothing=True, d_instance_noise=0.3,
                    d_lr_scale=0.5, d_acc_gate=0.9)
    G = BBHGenerator(n_out=cfg.n_pix, conv_impl=impl, dtype=dtype)
    D = PairDiscriminator(conv_impl=impl, dtype=dtype)
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
    except Exception as e:
        print(f"[{impl}/b{batch}/{dtype.__name__}] cost_analysis: {e}",
              flush=True)

    step = gan_mod.make_gan_step_scan(G, D, cfg, scan)
    key = jax.random.PRNGKey(4)
    t0 = time.perf_counter()
    state, m = step(state, bank, measured, key)
    float(np.asarray(m["d_loss"])[-1])  # forced remote completion
    compile_s = time.perf_counter() - t0

    reps = max(1, 500 // scan)
    t0 = time.perf_counter()
    for _ in range(reps):
        key, sub = jax.random.split(key)
        state, m = step(state, bank, measured, sub)
    final_loss = float(np.asarray(m["d_loss"])[-1])  # completion barrier
    dt = time.perf_counter() - t0
    sps = reps * scan / dt
    row = {"impl": impl, "batch": batch, "dtype": dtype.__name__,
           "steps_per_sec": round(sps, 2),
           "samples_per_sec": round(sps * batch, 1),
           "compile_s": round(compile_s, 1),
           "finite": bool(np.isfinite(final_loss))}
    if flops:
        row["mfu"] = round(flops * sps / PEAK_FLOPS, 4)
        assert row["mfu"] < 1.0, row
    print(json.dumps(row), flush=True)
    return row


def main():
    scan = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rows = []
    for dtype in (jnp.float32, jnp.bfloat16):
        for impl in ("xla", "pallas"):
            for batch in (8, 64, 256):
                try:
                    rows.append(time_cell(impl, batch, dtype, scan))
                except Exception as e:
                    print(f"FAILED {impl}/b{batch}/{dtype.__name__}: {e}",
                          flush=True)
    print("\n| impl | dtype | batch | steps/s | samples/s | MFU |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['impl']} | {r['dtype']} | {r['batch']} | "
              f"{r['steps_per_sec']} | {r['samples_per_sec']} | "
              f"{r.get('mfu', '—')} |")


if __name__ == "__main__":
    main()
