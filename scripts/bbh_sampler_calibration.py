"""Post-training sampler calibration on the flagship final state.

The posterior SAMPLER (MC-dropout on/off, bootstrap noise scale, latent
temperature) is an eval-time choice — no retraining involved. This script
restores the final GAN+CNN checkpoints of a finished run_bbh and reports
β / β_sanity / grid overlap / cloud diagnostics for a small grid of sampler
settings, so the dispersion calibration is measured rather than guessed
(the r2 run's training-time sampler over-dispersed ~4-5× with
posterior_noise=1.0).

Usage: python scripts/bbh_sampler_calibration.py OUT_DIR [n_draws]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gennet_tpu.cli.workloads import BBHConfig, _prepare_bbh_data, effective_n_sig
from gennet_tpu.eval import grid_posterior as gp
from gennet_tpu.eval import overlap as ov
from gennet_tpu.models import BBHGenerator, DualBranchPE, PairDiscriminator
from gennet_tpu.train import CNNConfig, GANConfig, init_cnn, init_gan
from gennet_tpu.train.checkpoints import CheckpointManager
from gennet_tpu.train.cnn import predict as cnn_predict
from gennet_tpu.train.gan import sample_generator


def main():
    out_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    # rebuild from the run's PERSISTED config (run_bbh writes config.json) —
    # defaults would silently mismatch the param tree / measured event for
    # runs trained with non-default seed/n_pix/conv_impl/bf16/batch sizes
    cfg_path = os.path.join(out_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            saved = json.load(f)
        known = {k: v for k, v in saved.items() if k in BBHConfig.__dataclass_fields__}
        cfg = BBHConfig(**{**known, "out_dir": out_dir})
    else:
        print(f"WARNING: {cfg_path} missing — assuming default BBHConfig; "
              "calibration numbers are wrong if the run used other settings")
        cfg = BBHConfig(out_dir=out_dir)
    if cfg.grid_grain <= 0:
        sys.exit("run has grid_grain<=0: no exact grid to calibrate against")

    # IDENTICAL data/key path to run_bbh so the measured event matches the
    # training run's exactly
    key = jax.random.PRNGKey(cfg.seed)
    from gennet_tpu.data import template_bank as tb

    bank, targets, signal, measured, norm, psd, truth, lalinf_samples, key = \
        _prepare_bbh_data(cfg, key)
    bank_cfg = tb.BankConfig()

    grid = None
    if cfg.grid_grain > 0:
        sigma = float(np.std(np.asarray(measured) - np.asarray(signal)))
        Lg, gmc, gq = gp.bbh_grid_posterior(measured, psd, bank_cfg, norm,
                                            sigma, grain=cfg.grid_grain)
        grid = (np.asarray(Lg), gmc, gq)
        ref_samples = gp.sample_grid_posterior(Lg, gmc, gq, 3907, seed=cfg.seed)

    import jax.numpy as jnp

    gan_cfg = GANConfig(n_pix=cfg.n_pix, batch_size=cfg.batch_size)
    dt = jnp.bfloat16 if cfg.bf16 else jnp.float32
    G = BBHGenerator(n_out=cfg.n_pix, dtype=dt, conv_impl=cfg.conv_impl)
    D = PairDiscriminator(dtype=dt, conv_impl=cfg.conv_impl)
    gan_state = init_gan(jax.random.PRNGKey(cfg.seed + 2), G, D, gan_cfg)
    gan_state, step = CheckpointManager(os.path.join(out_dir, "ckpt_gan")).restore(gan_state)
    pe_cfg = CNNConfig(n_pix=cfg.n_pix, batch_size=cfg.pe_batch_size)
    from gennet_tpu.models import CombinedPE

    pe = CombinedPE() if cfg.comb_pe_model else DualBranchPE()
    pe_state = init_cnn(jax.random.PRNGKey(cfg.seed + 1), pe, pe_cfg)
    pe_state, _ = CheckpointManager(os.path.join(out_dir, "ckpt_pe")).restore(pe_state)
    print(f"restored GAN step {step}")

    gm = gp.grid_moments(grid[0], grid[1], grid[2])
    for bn_mode in ("eval", "batch"):
        for dropout in (True, False):
            for pn in (0.0, 0.2, 0.5, 1.0):
                key, kz, kn = jax.random.split(key, 3)
                wf = sample_generator(G, gan_state, kz, n, gan_cfg,
                                      dropout=dropout, bn_mode=bn_mode)
                wf_in = wf + pn * effective_n_sig(cfg, norm) * jax.random.normal(kn, wf.shape, wf.dtype)
                s = np.asarray(cnn_predict(pe, pe_state, wf_in))
                row = {
                    "bn_mode": bn_mode, "dropout": dropout, "posterior_noise": pn,
                    "beta": ov.beta_overlap(s, ref_samples) if s[:, 0].var() > 0 else 0.0,
                    "grid_overlap": gp.grid_overlap_score(s, grid[0], grid[1], grid[2]),
                    "bias_mc": (s[:, 0].mean() - gm[0]) / max(gm[2], 1e-12),
                    "disp_mc": s[:, 0].std() / max(gm[2], 1e-12),
                    "disp_q": s[:, 1].std() / max(gm[3], 1e-12),
                }
                print(json.dumps({k: (round(float(v), 4)
                                      if not isinstance(v, (bool, str)) else v)
                                  for k, v in row.items()}), flush=True)


if __name__ == "__main__":
    main()
