"""Diagnose WHY the pair discriminator never loses (d_acc pegged at 1.0).

Hypothesis (r4 root-cause work, VERDICT r3 #3): the fake pair's channel 2
is ``measured - G(z)`` where ``measured`` is ONE fixed realization, while
the real pair's channel 2 is FRESH noise each draw.  As G approaches the
true signal, fake ch2 converges to the event's specific noise vector —
a constant D can memorize.  If so, even a PERFECT generator (G(z) == the
injected signal) is classified fake, so no G can ever close the gap and
adversarial pressure actively pushes G away from the truth (observed:
beta_raw decays 0.07 -> 0.0 over 50k steps while D acc stays 1.0).

This probe loads a trained checkpoint and scores five pair families:
  A  real pairs           [bank template, fresh noise]          (baseline)
  B  perfect-G pair       [signal, measured - signal]           (the test)
  C  ch2-swapped perfect  [signal, fresh noise]                 (isolates ch2)
  D  current fakes        [G(z), measured - G(z)]
  E  ch2-swapped fakes    [G(z), fresh noise]

Memorization is confirmed when A is REAL, B is FAKE, and C is REAL:
the only difference between B and C is WHICH noise vector sits in ch2.

ref: the reference shares the construction (bbhMahoGANy.py:1267-1289,
fixed noise_signal at :1028/:1074) so its raw posterior fights the same
asymmetry; it never instruments it.
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
from gennet_tpu.data import template_bank as tb
from gennet_tpu.models import BBHGenerator, PairDiscriminator
from gennet_tpu.train.checkpoints import CheckpointManager
from gennet_tpu.train.gan import GANConfig, init_gan, sample_generator


def main(run_dir: str):
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = BBHConfig(**json.load(f))
    key = jax.random.PRNGKey(cfg.seed)
    bank, targets, signal, measured, norm, psd, truth, _, key = \
        _prepare_bbh_data(cfg, key)

    gan_cfg = GANConfig(
        latent_dim=100, batch_size=cfg.batch_size, n_sig=cfg.n_sig,
        lr=cfg.lr, label_smoothing=cfg.label_smoothing,
        d_instance_noise=cfg.instance_noise, d_lr_scale=cfg.d_lr_scale,
        d_acc_gate=cfg.d_acc_gate, residual_route=cfg.res_loss_weight > 0,
        res_loss_weight=cfg.res_loss_weight, res_eval_mode=cfg.res_eval_mode)
    dt = jnp.float32
    G = BBHGenerator(n_out=cfg.n_pix, dtype=dt, conv_impl=cfg.conv_impl,
                     norm=cfg.g_norm)
    D = PairDiscriminator(dtype=dt, conv_impl=cfg.conv_impl)
    state = init_gan(jax.random.PRNGKey(cfg.seed + 2), G, D, gan_cfg)
    mgr = CheckpointManager(os.path.join(run_dir, "ckpt_gan"))
    state, step = mgr.restore(state)
    mgr.close()
    print(f"restored GAN state at step {int(state.step)}")

    B = 64
    k = jax.random.PRNGKey(123)
    k_idx, k_f1, k_f2, k_f3, k_z = jax.random.split(k, 5)
    ridx = jax.random.randint(k_idx, (B,), 0, bank.shape[0])
    tmpl = bank[ridx]
    fresh1 = jax.random.normal(k_f1, tmpl.shape) * cfg.n_sig
    fresh2 = jax.random.normal(k_f2, (B, cfg.n_pix)) * cfg.n_sig
    fresh3 = jax.random.normal(k_f3, (B, cfg.n_pix)) * cfg.n_sig

    gz = sample_generator(G, state, k_z, B, gan_cfg, dropout=False,
                          bn_mode="eval")
    gz = gz.reshape(B, -1)
    sig = jnp.broadcast_to(signal.reshape(1, -1), (B, cfg.n_pix))
    meas = jnp.broadcast_to(measured.reshape(1, -1), (B, cfg.n_pix))

    def pair(a, b):
        return jnp.stack([a, b], axis=-1)

    # the TRUE residual std in normalized units: make_event draws unit
    # noise then scales everything by norm = 1/std(measured), so the event
    # noise sits at std=norm — NOT cfg.n_sig. Families below separate the
    # two candidate cues: the specific memorized vector vs its variance.
    true_res = np.asarray(meas[0] - sig[0])
    true_std = float(true_res.std())
    k_p, k_f4 = jax.random.split(jax.random.PRNGKey(7))
    perm = jax.random.permutation(k_p, cfg.n_pix)
    shuf = jnp.broadcast_to(jnp.asarray(true_res)[perm][None, :],
                            (B, cfg.n_pix))
    fresh_true = jax.random.normal(k_f4, (B, cfg.n_pix)) * true_std
    print(f"cfg.n_sig={cfg.n_sig}  true residual std={true_std:.4f}  "
          f"(norm={float(norm):.4f})")

    families = {
        "A real   [tmpl, fresh@n_sig]": pair(tmpl, fresh1),
        "B perfect [sig, meas-sig]": pair(sig, meas - sig),
        "C swapped [sig, fresh@n_sig]": pair(sig, fresh2),
        "C2 varctl [sig, fresh@true]": pair(sig, fresh_true),
        "C3 shuffl [sig, perm(meas-sig)]": pair(sig, shuf),
        "D fake    [G, meas-G]": pair(gz, meas - gz),
        "E swapped [G, fresh@n_sig]": pair(gz, fresh3),
    }
    print(f"{'family':32s} {'mean logit':>10s} {'P(real)':>8s} "
          f"{'frac>0':>7s}")
    results = {}
    for name, x in families.items():
        logits = D.apply({"params": state.d_params}, x, train=False)
        logits = np.asarray(logits).reshape(-1)
        p = 1 / (1 + np.exp(-logits))
        results[name.split()[0]] = float(logits.mean())
        print(f"{name:32s} {logits.mean():10.3f} {p.mean():8.3f} "
              f"{(logits > 0).mean():7.2f}")

    print()
    if results["B"] < 0 and results["C"] > 0 and results["C2"] < 0:
        print("VARIANCE CUE: B (true residual), C2 (fresh noise at the SAME "
              "std), and C (fresh at cfg.n_sig) differ only in ch2 "
              "distribution; D keys on the std mismatch cfg.n_sig vs the "
              "event's actual noise std (= norm). The pair game is "
              "unwinnable because the real pairs' fresh channel is drawn at "
              "the WRONG scale — fix n_sig, not the scheme.")
    elif results["B"] < 0 and results["C2"] > 0:
        print("MEMORIZATION CONFIRMED: fresh noise at the true std passes "
              "but the event's own noise vector fails — D memorized the "
              "fixed realization; no G can ever fool it.")
    else:
        print("Mixed cue: see per-family logits above.")
    return results


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "out/bbh_sweeps/r4_r3probe_s0")
