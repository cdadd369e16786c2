"""Gen-4 two-stage pretraining scheme (ref: 2_model_version/).

Stage 1 — pretrain the discriminator against pure noise
  (ref: noise_gan.py: D learns N(0, nstd) noise vs generator output;
  artifact best_d_weights.hdf5, no_weight_code:260-262).
Stage 2 — pretrain the generator adversarially with an anti-mode-collapse
  config: latent dim 1, U(−5,5) latent (ref: no_mode_collapse_network.py:184;
  artifact best_g_weights.hdf5, :247-249).
Stage 3 — combine the pretrained weights into the subtraction GAN with
  one-sided label smoothing (true∈U(0.7,1), false∈U(0,0.3))
  (ref: subtract_model.py, no_weight_code:106-114,405-414).

Here "weight transfer" is just passing parameter pytrees (or orbax
checkpoints) between stages — no model surgery required.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp

from gennet_tpu.train.gan import GANConfig, GANState, init_gan, make_gan_step


def pretrain_discriminator_on_noise(key, generator, discriminator, cfg: GANConfig,
                                    n_iters: int, noise_std: float = 1.0,
                                    state: GANState | None = None):
    """Stage 1: D learns noise-vs-generated. Implemented as the standard
    alternating step with the 'real' bank replaced by fresh N(0, nstd) draws
    each iteration; only the resulting d_params are the stage artifact."""
    k_init, key = jax.random.split(key)
    state = state or init_gan(k_init, generator, discriminator, cfg)
    step = make_gan_step(generator, discriminator, cfg)
    n_pix = cfg.n_pix
    for _ in range(n_iters):
        key, k_noise, k_step = jax.random.split(key, 3)
        bank = noise_std * jax.random.normal(k_noise, (cfg.batch_size * 4, n_pix))
        measured = jnp.zeros((n_pix,))
        state, metrics = step(state, bank, measured, k_step)
    return state, metrics


def pretrain_generator(key, generator, discriminator, cfg: GANConfig, bank,
                       measured, n_iters: int, state: GANState | None = None):
    """Stage 2: adversarial G pretraining (the anti-mode-collapse run uses a
    TransposeGenerator with latent_dim=1 and U(−5,5) latent — pass a cfg with
    latent_low/high=(−5,5), ref: no_mode_collapse_network.py:184)."""
    k_init, key = jax.random.split(key)
    state = state or init_gan(k_init, generator, discriminator, cfg)
    step = make_gan_step(generator, discriminator, cfg)
    for _ in range(n_iters):
        key, k_step = jax.random.split(key)
        state, metrics = step(state, bank, measured, k_step)
    return state, metrics


def combine_pretrained(key, generator, discriminator, cfg: GANConfig,
                       g_state: GANState | None, d_state: GANState | None):
    """Stage 3 init: fresh optimizer state, parameters transplanted from the
    pretraining stages (ref: the commented-in load_weights calls,
    subtract_model.py no_weight_code:405-414). Label smoothing belongs in the
    combined run's cfg (label_smoothing=True)."""
    state = init_gan(key, generator, discriminator, cfg)
    if g_state is not None:
        state = state.replace(g_params=g_state.g_params, g_stats=g_state.g_stats)
    if d_state is not None:
        state = state.replace(d_params=d_state.d_params)
    return state


def run_two_stage(key, generator, discriminator, bank, measured,
                  cfg: GANConfig | None = None,
                  stage1_iters: int = 200, stage2_iters: int = 200,
                  stage3_iters: int = 1000, noise_std: float = 1.0):
    """Full three-stage pipeline; returns (final_state, metrics)."""
    cfg = cfg or GANConfig(n_pix=bank.shape[-1], pair_discriminator=False)
    k1, k2, k3, key = jax.random.split(key, 4)

    d_pre, _ = pretrain_discriminator_on_noise(
        k1, generator, discriminator, cfg, stage1_iters, noise_std
    )
    g_cfg = replace(cfg, latent_low=-5.0, latent_high=5.0)
    g_pre, _ = pretrain_generator(k2, generator, discriminator, g_cfg, bank,
                                  measured, stage2_iters)

    cfg3 = replace(cfg, label_smoothing=True, residual_route=True)
    state = combine_pretrained(k3, generator, discriminator, cfg3, g_pre, d_pre)
    step = make_gan_step(generator, discriminator, cfg3)
    metrics = {}
    for _ in range(stage3_iters):
        key, k_step = jax.random.split(key)
        state, metrics = step(state, bank, measured, k_step)
    return state, metrics
