"""Measure the event-twin exclusion cue on a ch1-only (pair_d=False) run.

The r4 memorization probe (d_memorization_probe.py) measured, on the PAIR
scheme, that D scores the TRUE waveform ~1.7 logits below random bank
templates: the twin is the one waveform never present in the real set, so
as G's draws concentrate near it, D learns "event-like ⇒ fake" and the
adversarial gradient actively repels G from the truth (the measured
late-training raw-β decay). `BBHConfig.twin_boost` restores real density
at the truth point; this probe quantifies the cue before/after:

    twin_penalty = mean D-logit(random bank templates) − D-logit(signal)

Positive ≈ the anti-truth cue (the r4 value: +1.7). Near 0 (or negative)
after the fix = D no longer penalizes the truth region.

Usage: python scripts/twin_cue_probe.py RUN_DIR
(RUN_DIR must be a pair_d=False run with a ckpt_gan checkpoint.)
"""
import json
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gennet_tpu.cli.workloads import BBHConfig, _prepare_bbh_data
from gennet_tpu.models import BBHGenerator, PairDiscriminator
from gennet_tpu.train.checkpoints import CheckpointManager
from gennet_tpu.train.gan import GANConfig, init_gan, sample_generator


def main(run_dir: str):
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = BBHConfig(**json.load(f))
    assert not cfg.pair_d, "twin_cue_probe measures the ch1-only scheme"
    key = jax.random.PRNGKey(cfg.seed)
    bank, targets, signal, measured, norm, psd, truth, _, key = \
        _prepare_bbh_data(cfg, key)

    gan_cfg = GANConfig(
        latent_dim=100, batch_size=cfg.batch_size, n_sig=cfg.n_sig,
        lr=cfg.lr, label_smoothing=cfg.label_smoothing,
        d_instance_noise=cfg.instance_noise, d_lr_scale=cfg.d_lr_scale,
        d_acc_gate=cfg.d_acc_gate, pair_discriminator=False,
        residual_route=cfg.res_loss_weight > 0,
        res_loss_weight=cfg.res_loss_weight, res_eval_mode=cfg.res_eval_mode)
    G = BBHGenerator(n_out=cfg.n_pix, conv_impl=cfg.conv_impl,
                     norm=cfg.g_norm)
    D = PairDiscriminator(conv_impl=cfg.conv_impl)
    state = init_gan(jax.random.PRNGKey(cfg.seed + 2), G, D, gan_cfg)
    mgr = CheckpointManager(os.path.join(run_dir, "ckpt_gan"))
    # the LAST TRAINING state, not the best-whiteness diagnostic the
    # workload parks at index gan_iters+1 (workloads.py saves it after the
    # final state, so a bare latest-restore would pick the diagnostic)
    train_steps = [s for s in mgr.all_steps() if s <= cfg.gan_iters] or None
    state, step = mgr.restore(state, step=max(train_steps) if train_steps else None)
    mgr.close()
    print(f"restored GAN state at step {int(state.step)}")

    B = 256
    k_idx, k_z = jax.random.split(jax.random.PRNGKey(123))
    ridx = jax.random.randint(k_idx, (B,), 0, bank.shape[0])
    gz = sample_generator(G, state, k_z, B, gan_cfg, dropout=False,
                          bn_mode="eval").reshape(B, -1)

    def score(x2d):
        logits = D.apply({"params": state.d_params}, x2d[..., None],
                         train=False)
        return np.asarray(logits).reshape(-1)

    l_bank = score(bank[ridx])
    l_sig = score(jnp.broadcast_to(signal.reshape(1, -1), (B, cfg.n_pix)))
    l_gz = score(gz)
    penalty = float(l_bank.mean() - l_sig.mean())
    out = {
        "run": run_dir, "step": int(state.step),
        "twin_boost": int(getattr(cfg, "twin_boost", 0) or 0),
        "logit_bank": float(l_bank.mean()),
        "logit_signal": float(l_sig.mean()),
        "logit_g": float(l_gz.mean()),
        "twin_penalty": penalty,
    }
    print(f"bank {l_bank.mean():+.3f}  signal(twin) {l_sig.mean():+.3f}  "
          f"G draws {l_gz.mean():+.3f}")
    print(f"twin_penalty = {penalty:+.3f} "
          f"({'anti-truth cue present' if penalty > 0.5 else 'cue absent'})")
    os.makedirs("out/bbh_sweeps", exist_ok=True)
    with open("out/bbh_sweeps/twin_cue.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    return out


if __name__ == "__main__":
    main(sys.argv[1])
