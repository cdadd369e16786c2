"""Fused GAN train step — the mahoGANy alternating scheme, one XLA program.

The reference's GAN iteration crosses the host boundary four times per step
(G.predict, host numpy pair assembly, two train_on_batch calls; ref:
bbhMahoGANy.py:1241-1299). Here the whole iteration — latent draws, bank
gather, pair stacking, D update, (optional) residual-moment update, G update
— is a single jitted step with on-device RNG; under data parallelism the
only cross-device traffic is the psum of gradients over ICI.

Keras "frozen discriminator" semantics (ref: set_trainable, :797-809,
1105-1114) become parameter partitioning: the G step differentiates w.r.t.
generator parameters only, with the (already-updated) discriminator applied
functionally. Keras's per-composite optimizers are preserved: D, the
adversarial G route, and the residual-moment G route each hold independent
Adam state, matching the reference's three compile() calls
(ref: burstMahoGANy.py:652-668).
"""

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from gennet_tpu.train import losses as L


@dataclass(frozen=True)
class GANConfig:
    """GAN training config (reference defaults: bbhMahoGANy.py:83-113 /
    burstMahoGANy.py:31-48)."""

    n_pix: int = 1024
    latent_dim: int = 100
    batch_size: int = 8                 # per-device batch
    lr: float = 9e-5
    beta1: float = 0.5
    n_sig: float = 1.0                  # whitened noise std (ref: :85)
    chi_loss: bool = False              # χ² G loss option (ref: :97,146-162)
    pair_discriminator: bool = True     # D sees (waveform, residual) pairs
    residual_route: bool = False        # burst 3-loss scheme (ref: :798-802)
    label_smoothing: bool = False       # one-sided smoothing (G8 variant,
                                        # ref: 2_model_version subtract_model
                                        # no_weight_code:106-114)
    latent_low: float = -1.0            # U(−1,1) latent (ref: :1247)
    latent_high: float = 1.0
    n_noise_real: int = 1               # noise realizations per sample (ref: :107)
    d_lr_scale: float = 1.0             # discriminator LR multiplier (<1 slows
                                        # D to prevent late-run overpowering)
    d_instance_noise: float = 0.0       # σ of fresh noise added to BOTH real
                                        # and fake D inputs (instance noise —
                                        # blurs the trivial real/fake
                                        # separation that stalls the burst
                                        # scheme; natural value = n_sig, the
                                        # measurement noise)
    g_steps_per_iter: int = 1           # adversarial G updates per iteration
    g_ema_decay: float = 0.0            # exponential moving average of G
                                        # params for sampling (0 = off);
                                        # damps the adversarial oscillation
                                        # that otherwise swings the posterior
                                        # around the truth
    d_sees_train_mode: bool = True      # D scores train-mode (dropout-on)
                                        # fakes — the distribution G actually
                                        # optimizes. The reference fed
                                        # eval-mode G.predict output to D
                                        # (ref: :1248) while training G in
                                        # train mode, which opens a mode-
                                        # mismatch cheat channel (G fools D
                                        # only under dropout while its eval
                                        # output collapses); False restores
                                        # the reference behavior.


class GANState(struct.PyTreeNode):
    g_params: Any
    g_stats: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    g_res_opt: Any
    g_ema: Any
    step: jnp.ndarray


def _adam(cfg: GANConfig):
    return optax.adam(cfg.lr, b1=cfg.beta1)


def _adam_d(cfg: GANConfig):
    return optax.adam(cfg.lr * cfg.d_lr_scale, b1=cfg.beta1)


def init_gan(key: jax.Array, generator, discriminator, cfg: GANConfig) -> GANState:
    """Initialize all parameter trees and the three optimizer states."""
    kg, kd = jax.random.split(key)
    z = jnp.zeros((1, cfg.latent_dim), jnp.float32)
    g_vars = generator.init({"params": kg, "dropout": kg}, z, train=False)
    d_ch = 2 if cfg.pair_discriminator else 1
    x = jnp.zeros((1, cfg.n_pix, d_ch), jnp.float32)
    d_vars = discriminator.init({"params": kd, "dropout": kd}, x, train=False)

    g_params = g_vars["params"]
    g_stats = g_vars.get("batch_stats", FrozenDict())
    d_params = d_vars["params"]
    return GANState(
        g_params=g_params,
        g_stats=g_stats,
        d_params=d_params,
        g_opt=_adam(cfg).init(g_params),
        d_opt=_adam_d(cfg).init(d_params),
        g_res_opt=_adam(cfg).init(g_params),
        g_ema=g_params,
        step=jnp.zeros((), jnp.int32),
    )


def _apply_g(generator, params, stats, z, rng, train):
    variables = {"params": params, "batch_stats": stats} if stats else {"params": params}
    if train:
        out, mut = generator.apply(
            variables, z, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"] if stats else [],
        )
        new_stats = mut.get("batch_stats", stats) if stats else stats
        return out, new_stats
    out = generator.apply(variables, z, train=False, rngs={"dropout": rng})
    return out, stats


def _d_inputs(x_gen, real, measured, noise_key, cfg: GANConfig):
    """Assemble D inputs: fake/real pairs for the subtraction scheme
    (ref pair assembly: bbhMahoGANy.py:1267-1289) or raw series (burst)."""
    if cfg.pair_discriminator:
        fresh = jax.random.normal(noise_key, real.shape, real.dtype) * cfg.n_sig
        fake = jnp.stack([x_gen, measured[None, :] - x_gen], axis=-1)
        realp = jnp.stack([real, fresh], axis=-1)
        return fake, realp
    return x_gen[..., None], real[..., None]


def gan_step(state: GANState, bank: jnp.ndarray, measured: jnp.ndarray, key: jax.Array,
             *, generator, discriminator, cfg: GANConfig, axis_name: str | None = None):
    """One full alternating GAN iteration. Pure; jit/shard_map-ready.

    bank: (N_bank, n_pix) device-resident whitened templates.
    measured: (n_pix,) the measured event h(t).
    Returns (new_state, metrics).
    """
    B = cfg.batch_size * cfg.n_noise_real
    k = jax.random.split(key, 14)
    psum = (lambda t: jax.lax.pmean(t, axis_name)) if axis_name else (lambda t: t)

    # ---------------- discriminator step --------------------------------
    z1 = jax.random.uniform(k[0], (B, cfg.latent_dim), minval=cfg.latent_low, maxval=cfg.latent_high)
    if cfg.d_sees_train_mode:
        # train-mode fake (dropout active), but without committing the BN
        # stat update — the D step must not advance generator state
        x_fake, _ = _apply_g(generator, state.g_params, state.g_stats, z1, k[1], train=True)
    else:
        x_fake, _ = _apply_g(generator, state.g_params, state.g_stats, z1, k[1], train=False)
    x_fake = x_fake.reshape(B, -1)

    ridx = jax.random.randint(k[2], (cfg.batch_size,), 0, bank.shape[0])
    real = jnp.tile(bank[ridx], (cfg.n_noise_real, 1))
    fake_in, real_in = _d_inputs(x_fake, real, measured, k[3], cfg)
    if cfg.d_instance_noise > 0.0:
        kn1, kn2 = jax.random.split(k[3])
        real_in = real_in + cfg.d_instance_noise * jax.random.normal(kn1, real_in.shape, real_in.dtype)
        fake_in = fake_in + cfg.d_instance_noise * jax.random.normal(kn2, fake_in.shape, fake_in.dtype)

    if cfg.label_smoothing:
        y_real = jax.random.uniform(k[4], (B,), minval=0.7, maxval=1.0)
        y_fake = jax.random.uniform(k[5], (B,), minval=0.0, maxval=0.3)
    else:
        y_real, y_fake = 1.0, 0.0

    def d_loss_fn(d_params):
        lr_ = discriminator.apply({"params": d_params}, real_in, train=True, rngs={"dropout": k[6]})
        lf_ = discriminator.apply({"params": d_params}, fake_in, train=True, rngs={"dropout": k[6]})
        loss = 0.5 * (L.bce_with_logits(lr_, y_real) + L.bce_with_logits(lf_, y_fake))
        acc = 0.5 * (L.binary_accuracy(lr_, 1.0) + L.binary_accuracy(lf_, 0.0))
        return loss, acc

    (d_loss, d_acc), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
    d_grads = psum(d_grads)
    d_upd, d_opt = _adam_d(cfg).update(d_grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, d_upd)

    g_params, g_stats = state.g_params, state.g_stats
    g_res_opt = state.g_res_opt
    res_loss = jnp.zeros(())

    # ---------------- residual-moment route (burst scheme) --------------
    if cfg.residual_route:
        z2 = jax.random.uniform(k[7], (B, cfg.latent_dim), minval=cfg.latent_low, maxval=cfg.latent_high)

        def res_loss_fn(gp):
            x, new_stats = _apply_g(generator, gp, g_stats, z2, k[10], train=True)
            resid = measured[None, :, None] - x
            return L.residual_moment_loss(resid, cfg.n_sig), new_stats

        (res_loss, new_stats), r_grads = jax.value_and_grad(res_loss_fn, has_aux=True)(g_params)
        r_grads = psum(r_grads)
        r_upd, g_res_opt = _adam(cfg).update(r_grads, g_res_opt, g_params)
        g_params = optax.apply_updates(g_params, r_upd)
        g_stats = new_stats

    # ---------------- generator adversarial step(s) ---------------------
    g_opt = state.g_opt
    g_loss = jnp.zeros(())
    g_acc = jnp.zeros(())
    for s in range(max(1, cfg.g_steps_per_iter)):
        kz = jax.random.fold_in(k[8], s)
        kd_ = jax.random.fold_in(k[9], s)
        kdrop = jax.random.fold_in(k[11], s)
        z3 = jax.random.uniform(kz, (B, cfg.latent_dim), minval=cfg.latent_low, maxval=cfg.latent_high)

        def g_loss_fn(gp):
            x, new_stats = _apply_g(generator, gp, g_stats, z3, kdrop, train=True)
            xf = x.reshape(B, -1)
            if cfg.pair_discriminator:
                d_in = jnp.stack([xf, measured[None, :] - xf], axis=-1)
            else:
                d_in = x if x.ndim == 3 else xf[..., None]
            logits = discriminator.apply({"params": d_params}, d_in, train=True, rngs={"dropout": kd_})
            if cfg.chi_loss:
                loss = L.chisquare_loss(jax.nn.sigmoid(logits), 1.0, cfg.n_sig)
            else:
                loss = L.bce_with_logits(logits, 1.0)
            acc = L.binary_accuracy(logits, 1.0)
            return loss, (acc, new_stats)

        (g_loss, (g_acc, g_stats)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)
        g_grads = psum(g_grads)
        g_upd, g_opt = _adam(cfg).update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_upd)

    # batch-norm running stats are computed from per-device batches — average
    # them across the mesh so the replicated state stays consistent
    g_stats = psum(g_stats) if g_stats else g_stats

    # EMA of generator params for stable sampling
    if cfg.g_ema_decay > 0.0:
        d_ = cfg.g_ema_decay
        g_ema = jax.tree_util.tree_map(lambda e, p: d_ * e + (1.0 - d_) * p,
                                       state.g_ema, g_params)
    else:
        g_ema = g_params

    new_state = GANState(
        g_params=g_params, g_stats=g_stats, d_params=d_params,
        g_opt=g_opt, d_opt=d_opt, g_res_opt=g_res_opt, g_ema=g_ema,
        step=state.step + 1,
    )
    metrics = {
        "d_loss": psum(d_loss), "d_acc": psum(d_acc),
        "g_loss": psum(g_loss), "g_acc": psum(g_acc),
        "res_loss": psum(res_loss),
    }
    return new_state, metrics


def make_gan_step(generator, discriminator, cfg: GANConfig, mesh=None):
    """Build the jitted train step; with a mesh, a shard_map data-parallel
    step (bank sharded over 'data', state replicated, grads pmean'd on ICI).

    The data-parallel step takes the same (state, bank, measured, key)
    signature; each device folds the key by its mesh position so latent/bank
    draws decorrelate across the mesh.
    """
    if mesh is None:
        return jax.jit(
            partial(gan_step, generator=generator, discriminator=discriminator, cfg=cfg)
        )

    from jax.sharding import PartitionSpec as P

    def sharded(state, bank, measured, key):
        dev = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, dev)
        return gan_step(
            state, bank, measured, key,
            generator=generator, discriminator=discriminator, cfg=cfg,
            axis_name="data",
        )

    step = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


_SAMPLE_FN_CACHE: dict = {}


def _sample_fn(generator, dropout: bool):
    """Cached jitted chunk sampler — unjitted flax apply dispatches each op
    separately (very slow over a remote device link)."""
    key_ = (generator, bool(dropout))
    if key_ not in _SAMPLE_FN_CACHE:

        def f(params, stats, z, rng):
            return _apply_g(generator, params, stats, z, rng, train=dropout)[0]

        _SAMPLE_FN_CACHE[key_] = jax.jit(f)
    return _SAMPLE_FN_CACHE[key_]


def sample_generator(generator, state: GANState, key: jax.Array, n: int, cfg: GANConfig,
                     chunk: int = 256, dropout: bool = False, use_ema: bool = True):
    """Draw n waveform estimates from the trained generator.

    ``dropout=False`` is the reference's generator.predict behavior
    (ref: :1330-1331). ``dropout=True`` keeps the generator's dropout active
    during sampling — the MC-dropout move of the method's own lineage
    (ref: ganymede.py PermaDropout posterior draws, :617-620), which treats
    dropout as the variational sampler and restores posterior dispersion
    that latent variation alone under-represents.

    Chunked so large posterior draws (4000 samples through a generator with
    1024-channel activations) never exceed HBM — Keras predict auto-batched;
    here chunks reuse one compiled program of static shape.
    """
    fn = _sample_fn(generator, dropout)
    params = state.g_ema if (use_ema and cfg.g_ema_decay > 0.0) else state.g_params
    outs = []
    done = 0
    while done < n:
        key, sub = jax.random.split(key)
        z = jax.random.uniform(sub, (chunk, cfg.latent_dim),
                               minval=cfg.latent_low, maxval=cfg.latent_high)
        outs.append(fn(params, state.g_stats, z, sub).reshape(chunk, -1))
        done += chunk
    return jnp.concatenate(outs, axis=0)[:n]
