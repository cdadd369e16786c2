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

The step is split into :func:`draw_gan_batch` (all RNG consumption → a
:class:`GANBatch` pytree) and :func:`gan_update` (deterministic math given a
batch). This makes the data-parallel invariant *exactly* testable: the
8-shard pmean'd update equals a single-device update on the concatenation of
the 8 per-device batches (tests/test_train.py::test_gan_dp_8_matches_global_batch).
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
    res_loss_weight: float = 1.0        # weight on the residual-moment route
    res_spectral_bands: int = 0         # >0: the residual route matches the
                                        # band-averaged residual periodogram
                                        # to the flat n_sig² noise floor over
                                        # this many bands (losses.
                                        # residual_spectral_loss) instead of
                                        # the 2-moment target — measured r4:
                                        # mean+variance alone are satisfiable
                                        # WITHOUT subtracting the signal at
                                        # BBH SNRs (near-zero G reached
                                        # res_loss ~1e-3 with its posterior
                                        # 50σ off); the frequency-resolved
                                        # test is the analytic replacement
                                        # for the pair channel's whiteness
                                        # discrimination.
    res_eval_mode: bool = False         # compute the residual route on the
                                        # generator's EVAL-mode output
                                        # (dropout off, BN running averages).
                                        # Measured (r2 calibration): G's loss
                                        # is only ever evaluated in train
                                        # mode, leaving eval mode
                                        # unconstrained — the r2 flagship's
                                        # eval draws were +8.8σ biased while
                                        # its dropout draws were centered.
                                        # This pins the deterministic output
                                        # to the event while the adversarial
                                        # route keeps train-mode diversity.
    label_smoothing: bool = False       # one-sided smoothing (G8 variant,
                                        # ref: 2_model_version subtract_model
                                        # no_weight_code:106-114)
    latent_low: float = -1.0            # U(−1,1) latent (ref: :1247)
    latent_high: float = 1.0
    n_noise_real: int = 1               # noise realizations per sample (ref: :107)
    d_lr_scale: float = 1.0             # discriminator LR multiplier (<1 slows
                                        # D to prevent late-run overpowering)
    d_acc_gate: float = 0.0             # if >0: apply the D update only while
                                        # its (mesh-synced) batch accuracy is
                                        # below this threshold — an automatic
                                        # D/G balance controller that prevents
                                        # the late-run d_acc=1.0 saturation the
                                        # reference's fixed schedule drifts
                                        # into (its run stays oscillating,
                                        # ref bbhMahoGANy.py:1241-1382; ours
                                        # must too on a 500k schedule)
    d_instance_noise: float = 0.0       # σ of fresh noise added to BOTH real
                                        # and fake D inputs (instance noise —
                                        # blurs the trivial real/fake
                                        # separation that stalls the burst
                                        # scheme; natural value = n_sig, the
                                        # measurement noise). The σ VALUE is
                                        # a traced knob; != 0 gates the draw.
    r1_gamma: float = 0.0               # R1 gradient penalty on D's real
                                        # inputs (Mescheder et al. 2018):
                                        # γ/2·E‖∇ₓD‖² — regularizes D away
                                        # from the saturating, over-confident
                                        # regime that collapses late training.
                                        # The γ VALUE is a traced knob; > 0
                                        # gates the extra grad computation.
    g_steps_per_iter: int = 1           # adversarial G updates per iteration
    diversity_weight: float = 0.0       # mode-seeking regularizer weight
                                        # (Mao et al. 2019): penalize
                                        # 1/(mean|G(za)−G(zb)| / mean|za−zb|)
                                        # so distinct latents map to distinct
                                        # waveforms — counters the posterior
                                        # over-narrowing of a collapsing G
    g_ema_decay: float = 0.0            # exponential moving average of G
                                        # params for sampling (0 = off);
                                        # damps the adversarial oscillation
                                        # that otherwise swings the posterior
                                        # around the truth
    debug_probes: bool = False          # add per-term health metrics to the
                                        # step output (grad norms per route,
                                        # logit extremes, param norms, min BN
                                        # running variance) — the instrument
                                        # for root-causing non-finite states
                                        # (r3 flagship NaN at GAN step 7500).
                                        # Static: changes the metrics pytree,
                                        # so toggling recompiles.
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


class GANKnobs(struct.PyTreeNode):
    """Continuous training-control knobs, passed as TRACED operands so every
    knob setting shares one compiled XLA program (compiles cost 5–15 min on
    this backend — NOTES-TPU.md #3; sweeping baked constants would recompile
    per value)."""

    d_acc_gate: jnp.ndarray       # D updates only while d_acc < gate; ≥1 ⇒ off
    diversity_weight: jnp.ndarray
    res_loss_weight: jnp.ndarray
    instance_noise: jnp.ndarray   # σ scale of the (unit) drawn instance noise
    r1_gamma: jnp.ndarray
    adv_weight: jnp.ndarray       # weight of G's adversarial BCE/χ² term;
                                  # 0 + d_acc_gate<0 = "terminal anneal": D
                                  # frozen and G settles on the residual
                                  # route alone, so a long run's FINAL state
                                  # is deterministically a high-fidelity one
                                  # instead of a sample of the adversarial
                                  # oscillation


def knobs_from_cfg(cfg: "GANConfig") -> GANKnobs:
    return GANKnobs(
        d_acc_gate=jnp.asarray(cfg.d_acc_gate if cfg.d_acc_gate > 0 else 2.0,
                               jnp.float32),
        diversity_weight=jnp.asarray(cfg.diversity_weight, jnp.float32),
        res_loss_weight=jnp.asarray(cfg.res_loss_weight, jnp.float32),
        instance_noise=jnp.asarray(cfg.d_instance_noise, jnp.float32),
        r1_gamma=jnp.asarray(cfg.r1_gamma, jnp.float32),
        adv_weight=jnp.asarray(1.0, jnp.float32),
    )


class GANBatch(struct.PyTreeNode):
    """All random draws of one GAN iteration, materialized.

    Concatenating per-device batches along the batch axis yields the global
    batch of the equivalent single-device step (the DP-math invariant)."""

    z1: jnp.ndarray          # (B, latent) D-step latents
    real: jnp.ndarray        # (B, n_pix) bank gather (tiled over n_noise_real)
    fresh: jnp.ndarray       # (B, n_pix) fresh N(0, n_sig) real-pair channel
    in_real: Any             # instance noise on real D input (or None)
    in_fake: Any             # instance noise on fake D input (or None)
    in_g: Any                # (S, B, n_pix, d_ch) instance noise on the G
                             # route's D input (or None) — G must optimize
                             # against the same noisy input distribution D
                             # was trained on, not a privileged clean view
    y_real: jnp.ndarray      # (B,) real labels (smoothed or 1s)
    y_fake: jnp.ndarray      # (B,) fake labels (smoothed or 0s)
    z2: Any                  # (B, latent) residual-route latents (or None)
    z3: jnp.ndarray          # (S, B, latent) adversarial G-step latents
    kfake: jnp.ndarray       # dropout key, D-step fake generation
    kd: jnp.ndarray          # dropout key, D step
    kres: jnp.ndarray        # dropout key, residual route
    kg: jnp.ndarray          # (S, 2) dropout keys for G steps (G, D applies)


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


def draw_gan_batch(key: jax.Array, bank: jnp.ndarray, cfg: GANConfig) -> GANBatch:
    """Consume all of one iteration's randomness (distinct key per consumer).

    bank: (N_bank, n_pix) device-resident whitened templates."""
    B = cfg.batch_size * cfg.n_noise_real
    (k_z1, k_idx, k_fresh, k_inr, k_inf, k_yr, k_yf, k_z2, k_z3,
     k_fake, k_kd, k_kres, k_kg) = jax.random.split(key, 13)

    z1 = jax.random.uniform(k_z1, (B, cfg.latent_dim),
                            minval=cfg.latent_low, maxval=cfg.latent_high)
    ridx = jax.random.randint(k_idx, (cfg.batch_size,), 0, bank.shape[0])
    real = jnp.tile(bank[ridx], (cfg.n_noise_real, 1))
    fresh = jax.random.normal(k_fresh, real.shape, real.dtype) * cfg.n_sig

    d_ch = 2 if cfg.pair_discriminator else 1
    in_shape = (B, real.shape[1], d_ch)
    S = max(1, cfg.g_steps_per_iter)
    if cfg.d_instance_noise > 0.0:
        # unit noise; the σ scale is applied in gan_update from the traced
        # knob so it can be swept/annealed without recompiling
        k_inf, k_ing = jax.random.split(k_inf)
        in_real = jax.random.normal(k_inr, in_shape)
        in_fake = jax.random.normal(k_inf, in_shape)
        in_g = jax.random.normal(k_ing, (S,) + in_shape)
    else:
        in_real = in_fake = in_g = None

    if cfg.label_smoothing:
        y_real = jax.random.uniform(k_yr, (B,), minval=0.7, maxval=1.0)
        y_fake = jax.random.uniform(k_yf, (B,), minval=0.0, maxval=0.3)
    else:
        y_real = jnp.ones((B,), jnp.float32)
        y_fake = jnp.zeros((B,), jnp.float32)

    z2 = (jax.random.uniform(k_z2, (B, cfg.latent_dim),
                             minval=cfg.latent_low, maxval=cfg.latent_high)
          if cfg.residual_route else None)
    z3 = jax.random.uniform(k_z3, (S, B, cfg.latent_dim),
                            minval=cfg.latent_low, maxval=cfg.latent_high)
    return GANBatch(
        z1=z1, real=real, fresh=fresh, in_real=in_real, in_fake=in_fake,
        in_g=in_g, y_real=y_real, y_fake=y_fake, z2=z2, z3=z3,
        kfake=k_fake, kd=k_kd, kres=k_kres,
        kg=jax.random.split(k_kg, S * 2).reshape(S, 2, 2),
    )


def _d_inputs(x_gen, batch: GANBatch, measured, cfg: GANConfig, knobs: GANKnobs):
    """Assemble D inputs: fake/real pairs for the subtraction scheme
    (ref pair assembly: bbhMahoGANy.py:1267-1289) or raw series (burst)."""
    if cfg.pair_discriminator:
        fake = jnp.stack([x_gen, measured[None, :] - x_gen], axis=-1)
        realp = jnp.stack([batch.real, batch.fresh], axis=-1)
    else:
        fake, realp = x_gen[..., None], batch.real[..., None]
    if batch.in_real is not None:
        realp = realp + knobs.instance_noise * batch.in_real
        fake = fake + knobs.instance_noise * batch.in_fake
    return fake, realp


def _where_tree(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def gan_update(state: GANState, batch: GANBatch, measured: jnp.ndarray,
               knobs: GANKnobs | None = None, *, generator, discriminator,
               cfg: GANConfig, axis_name: str | None = None):
    """Deterministic half of the step: given a drawn batch, run the D update,
    the optional residual-moment update, and the G update(s).

    Pure; jit/shard_map-ready. Returns (new_state, metrics)."""
    if knobs is None:
        knobs = knobs_from_cfg(cfg)
    B = batch.z1.shape[0]
    psum = (lambda t: jax.lax.pmean(t, axis_name)) if axis_name else (lambda t: t)

    # ---------------- discriminator step --------------------------------
    if cfg.d_sees_train_mode:
        # train-mode fake (dropout active), but without committing the BN
        # stat update — the D step must not advance generator state
        x_fake, _ = _apply_g(generator, state.g_params, state.g_stats,
                             batch.z1, batch.kfake, train=True)
    else:
        x_fake, _ = _apply_g(generator, state.g_params, state.g_stats,
                             batch.z1, batch.kfake, train=False)
    x_fake = x_fake.reshape(B, -1)
    fake_in, real_in = _d_inputs(x_fake, batch, measured, cfg, knobs)

    def d_loss_fn(d_params):
        lr_ = discriminator.apply({"params": d_params}, real_in, train=True,
                                  rngs={"dropout": batch.kd})
        lf_ = discriminator.apply({"params": d_params}, fake_in, train=True,
                                  rngs={"dropout": batch.kd})
        loss = 0.5 * (L.bce_with_logits(lr_, batch.y_real) + L.bce_with_logits(lf_, batch.y_fake))
        if cfg.r1_gamma > 0.0:
            # R1: γ/2·E‖∇ₓ D(x_real)‖² (Mescheder et al. 2018) — keeps D's
            # decision surface smooth so it cannot saturate into the
            # d_acc=1.0 regime that starves G late in long schedules
            def logit_sum(x):
                return discriminator.apply({"params": d_params}, x, train=True,
                                           rngs={"dropout": batch.kd}).sum()

            gx = jax.grad(logit_sum)(real_in)
            r1 = jnp.mean(jnp.sum(gx**2, axis=tuple(range(1, gx.ndim))))
            loss = loss + 0.5 * knobs.r1_gamma * r1
        acc = 0.5 * (L.binary_accuracy(lr_, 1.0) + L.binary_accuracy(lf_, 0.0))
        logit_absmax = jnp.maximum(jnp.max(jnp.abs(lr_)), jnp.max(jnp.abs(lf_)))
        return loss, (acc, logit_absmax)

    (d_loss, (d_acc, d_logit_absmax)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(state.d_params)
    d_grads = psum(d_grads)
    d_acc = psum(d_acc)  # mesh-synced so the balance gate agrees everywhere
    d_upd, d_opt_new = _adam_d(cfg).update(d_grads, state.d_opt, state.d_params)
    d_params_new = optax.apply_updates(state.d_params, d_upd)
    # automatic D/G balance: skip the D update while D already wins
    # (gate ≥ 1.0 ⇒ always update, the reference's fixed schedule)
    gate = d_acc < knobs.d_acc_gate
    d_params = _where_tree(gate, d_params_new, state.d_params)
    d_opt = _where_tree(gate, d_opt_new, state.d_opt)

    g_params, g_stats = state.g_params, state.g_stats
    g_res_opt = state.g_res_opt
    res_loss = jnp.zeros(())

    # ---------------- residual-moment route (burst scheme) --------------
    if cfg.residual_route:
        res_train = not cfg.res_eval_mode

        def res_loss_fn(gp):
            x, new_stats = _apply_g(generator, gp, g_stats, batch.z2,
                                    batch.kres, train=res_train)
            resid = measured[None, :, None] - x
            if cfg.res_spectral_bands > 0:
                rl = L.residual_spectral_loss(resid, cfg.n_sig,
                                              cfg.res_spectral_bands)
            else:
                rl = L.residual_moment_loss(resid, cfg.n_sig)
            return knobs.res_loss_weight * rl, new_stats

        (res_loss, new_stats), r_grads = jax.value_and_grad(res_loss_fn, has_aux=True)(g_params)
        r_grads = psum(r_grads)
        r_upd, g_res_opt = _adam(cfg).update(r_grads, g_res_opt, g_params)
        g_params = optax.apply_updates(g_params, r_upd)
        g_stats = new_stats

    # ---------------- generator adversarial step(s) ---------------------
    g_opt = state.g_opt
    g_loss = jnp.zeros(())
    g_acc = jnp.zeros(())
    for s in range(batch.z3.shape[0]):
        z3 = batch.z3[s]
        kdrop, kd_ = batch.kg[s, 0], batch.kg[s, 1]

        def g_loss_fn(gp):
            x, new_stats = _apply_g(generator, gp, g_stats, z3, kdrop, train=True)
            xf = x.reshape(B, -1)
            if cfg.pair_discriminator:
                d_in = jnp.stack([xf, measured[None, :] - xf], axis=-1)
            else:
                d_in = x if x.ndim == 3 else xf[..., None]
            if batch.in_g is not None:
                # same instance-noise distribution the D update saw — without
                # it G optimizes a privileged clean view of D's input space
                d_in = d_in + knobs.instance_noise * batch.in_g[s]
            logits = discriminator.apply({"params": d_params}, d_in, train=True,
                                         rngs={"dropout": kd_})
            if cfg.chi_loss:
                loss = L.chisquare_loss(jax.nn.sigmoid(logits), 1.0, cfg.n_sig)
            else:
                loss = L.bce_with_logits(logits, 1.0)
            loss = knobs.adv_weight * loss
            # mode-seeking term (Mao et al. 2019): distinct latents must
            # map to distinct waveforms; guards posterior dispersion
            # (weight 0 ⇒ exact no-op gradient; the ratio denominator is
            # bounded below by 1e-5 so the term never produces NaN).
            # Needs ≥2 samples per device — at B=1 the half-batch split is
            # empty and mean-of-empty is NaN even at weight 0 (B is static,
            # so this is a compile-time gate).
            h = B // 2
            if h >= 1:
                num = jnp.mean(jnp.abs(xf[:h] - xf[h : 2 * h]))
                den = jnp.mean(jnp.abs(z3[:h] - z3[h : 2 * h])) + 1e-8
                loss = loss + knobs.diversity_weight / (num / den + 1e-5)
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
        "d_loss": psum(d_loss), "d_acc": d_acc,
        "g_loss": psum(g_loss), "g_acc": psum(g_acc),
        "res_loss": psum(res_loss),
    }
    if cfg.debug_probes:
        gnorm = optax.global_norm
        # route-separated gradient norms + state norms + activation extremes:
        # whichever diverges FIRST names the culprit term (a NaN anywhere
        # poisons its norm, so these also localize non-finiteness in time)
        var_mins = [jnp.min(leaf) for path, leaf in
                    jax.tree_util.tree_flatten_with_path(g_stats)[0]
                    if "var" in jax.tree_util.keystr(path)]
        metrics.update({
            "d_grad_norm": gnorm(d_grads),
            "g_grad_norm": gnorm(g_grads),
            "res_grad_norm": gnorm(r_grads) if cfg.residual_route else jnp.zeros(()),
            "g_param_norm": gnorm(g_params),
            "d_param_norm": gnorm(d_params),
            "x_fake_absmax": jnp.max(jnp.abs(x_fake)),
            "d_logit_absmax": d_logit_absmax,
            "bn_var_min": (jnp.min(jnp.stack(var_mins)) if var_mins
                           else jnp.ones(())),
        })
    return new_state, metrics


def gan_step(state: GANState, bank: jnp.ndarray, measured: jnp.ndarray, key: jax.Array,
             knobs: GANKnobs | None = None, *, generator, discriminator,
             cfg: GANConfig, axis_name: str | None = None):
    """One full alternating GAN iteration. Pure; jit/shard_map-ready.

    bank: (N_bank, n_pix) device-resident whitened templates.
    measured: (n_pix,) the measured event h(t).
    Returns (new_state, metrics).
    """
    batch = draw_gan_batch(key, bank, cfg)
    return gan_update(state, batch, measured, knobs, generator=generator,
                      discriminator=discriminator, cfg=cfg, axis_name=axis_name)


def make_gan_step(generator, discriminator, cfg: GANConfig, mesh=None):
    """Build the jitted train step; with a mesh, a shard_map data-parallel
    step (bank sharded over 'data', state replicated, grads pmean'd on ICI).

    The continuous knobs (d_acc_gate, diversity_weight, res_loss_weight) are
    bound as device operands at call time, so every knob setting reuses one
    compiled program (NOTES-TPU.md #3). The returned step keeps the
    (state, bank, measured, key) signature.

    The data-parallel step folds the key by mesh position on each device so
    latent/bank draws decorrelate across the mesh.
    """
    knob_vals = knobs_from_cfg(cfg)

    if mesh is None:
        jitted = jax.jit(
            partial(gan_step, generator=generator, discriminator=discriminator, cfg=cfg)
        )
        return lambda state, bank, measured, key, knobs=None: jitted(
            state, bank, measured, key, knobs if knobs is not None else knob_vals)

    from jax.sharding import PartitionSpec as P

    def sharded(state, bank, measured, key, knobs):
        dev = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, dev)
        return gan_step(
            state, bank, measured, key, knobs,
            generator=generator, discriminator=discriminator, cfg=cfg,
            axis_name="data",
        )

    step = jax.jit(jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P("data"), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    return lambda state, bank, measured, key, knobs=None: step(
        state, bank, measured, key, knobs if knobs is not None else knob_vals)


def make_gan_step_scan(generator, discriminator, cfg: GANConfig, n_steps: int,
                       mesh=None):
    """``n_steps`` GAN iterations fused into ONE dispatched program via
    lax.scan — the workload inner loop.

    Per-call dispatch over the remote device link costs 10–20 ms
    (NOTES-TPU.md #4), comparable to the batch-8 step's compute, so chaining
    cadence-many steps into one program removes ~n_steps× of relay latency.
    The scan body is the same traced step, compiled once.

    Returns step(state, bank, measured, key) → (state, metrics) where each
    metric is stacked over the n_steps iterations (full-cadence
    observability for free).
    """
    knob_vals = knobs_from_cfg(cfg)

    def many(state, bank, measured, key, knobs):
        keys = jax.random.split(key, n_steps)

        def body(st, k):
            return gan_step(st, bank, measured, k, knobs,
                            generator=generator, discriminator=discriminator,
                            cfg=cfg, axis_name="data" if mesh is not None else None)

        return jax.lax.scan(body, state, keys)

    if mesh is None:
        jitted = jax.jit(many)
        return lambda state, bank, measured, key, knobs=None: jitted(
            state, bank, measured, key, knobs if knobs is not None else knob_vals)

    from jax.sharding import PartitionSpec as P

    def sharded(state, bank, measured, key, knobs):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return many(state, bank, measured, key, knobs)

    step = jax.jit(jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P("data"), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    return lambda state, bank, measured, key, knobs=None: step(
        state, bank, measured, key, knobs if knobs is not None else knob_vals)


_SAMPLE_FN_CACHE: dict = {}


def _sample_fn(generator, dropout: bool, bn_mode: str = "eval"):
    """Cached jitted chunk sampler — unjitted flax apply dispatches each op
    separately (very slow over a remote device link)."""
    key_ = (generator, bool(dropout), bn_mode)
    if key_ not in _SAMPLE_FN_CACHE:

        def f(params, stats, z, rng):
            variables = ({"params": params, "batch_stats": stats}
                         if stats else {"params": params})
            kwargs = {}
            if bn_mode == "batch":
                # draw with batch-statistics BN — the mode the generator was
                # optimized in (running averages lag the adversarial
                # oscillation; measured +8.8σ eval-mode bias on the r2
                # flagship state) — while dropout stays as requested
                kwargs["bn_train"] = True
            if stats and (dropout or bn_mode == "batch"):
                out, _ = generator.apply(variables, z, train=dropout,
                                         rngs={"dropout": rng},
                                         mutable=["batch_stats"], **kwargs)
                return out
            return generator.apply(variables, z, train=dropout,
                                   rngs={"dropout": rng}, **kwargs)

        _SAMPLE_FN_CACHE[key_] = jax.jit(f)
    return _SAMPLE_FN_CACHE[key_]


def sample_generator(generator, state: GANState, key: jax.Array, n: int, cfg: GANConfig,
                     chunk: int = 256, dropout: bool = False, use_ema: bool = True,
                     temp: float = 1.0, bn_mode: str = "eval"):
    """Draw n waveform estimates from the trained generator.

    ``dropout=False`` is the reference's generator.predict behavior
    (ref: :1330-1331). ``dropout=True`` keeps the generator's dropout active
    during sampling — the MC-dropout move of the method's own lineage
    (ref: ganymede.py PermaDropout posterior draws, :617-620), which treats
    dropout as the variational sampler and restores posterior dispersion
    that latent variation alone under-represents.

    ``bn_mode='batch'`` evaluates BatchNorm with the draw batch's own
    statistics (train-consistent) instead of the lagged running averages;
    requires a generator whose __call__ accepts ``bn_train`` (BBHGenerator).

    ``temp`` scales the latent draw about the range midpoint (temperature):
    >1 widens posterior dispersion, <1 narrows it.

    Chunked so large posterior draws (4000 samples through a generator with
    1024-channel activations) never exceed HBM — Keras predict auto-batched;
    here chunks reuse one compiled program of static shape.
    """
    fn = _sample_fn(generator, dropout, bn_mode)
    params = state.g_ema if (use_ema and cfg.g_ema_decay > 0.0) else state.g_params
    center = 0.5 * (cfg.latent_low + cfg.latent_high)
    outs = []
    done = 0
    while done < n:
        key, kz, kdrop = jax.random.split(key, 3)
        z = jax.random.uniform(kz, (chunk, cfg.latent_dim),
                               minval=cfg.latent_low, maxval=cfg.latent_high)
        if temp != 1.0:
            z = center + temp * (z - center)
        outs.append(fn(params, state.g_stats, z, kdrop).reshape(chunk, -1))
        done += chunk
    return jnp.concatenate(outs, axis=0)[:n]
