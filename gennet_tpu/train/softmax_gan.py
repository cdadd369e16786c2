"""Gen-3 softmax-style GAN trainer (two-class discriminator).

ref: train_on_wvf_version/nn.py:100-152 and the ht-subtraction variant
(ht_noise_subtract_version/nn.py:179-196): D outputs two sigmoid "class"
scores, real batches labelled [0,1], generated [1,0], the G route trained
toward [0,1]; D pretrained one pass before the alternating loop. The
reference's asymmetric optimizers are kept: SGD(0.425e-1) for G (Keras
compiles the GAN composite with G's optimizer, nn.py:79-106), Adam(1e-6)
for D.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gennet_tpu.train.losses import bce_with_logits


@dataclass(frozen=True)
class SoftmaxGANConfig:
    n_out: int = 512
    latent_dim: int = 10
    batch_size: int = 32
    g_lr: float = 0.425e-1           # ref: nn.py:51 (SGD)
    d_lr: float = 1e-6               # ref: nn.py:53 (Adam)
    subtract_ht: bool = False        # gen-3b: fake = h(t) − G(z)
                                     # (ref: ht_noise_subtract_version/nn.py:179-196)


class SoftmaxGANState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def _g_tx(cfg):
    return optax.sgd(cfg.g_lr)


def _d_tx(cfg):
    return optax.adam(cfg.d_lr)


def init_softmax_gan(key, generator, discriminator, cfg: SoftmaxGANConfig) -> SoftmaxGANState:
    kg, kd = jax.random.split(key)
    g_params = generator.init({"params": kg}, jnp.zeros((1, cfg.latent_dim)))["params"]
    d_params = discriminator.init(
        {"params": kd, "dropout": kd}, jnp.zeros((1, cfg.n_out)), train=False
    )["params"]
    return SoftmaxGANState(
        g_params=g_params, d_params=d_params,
        g_opt=_g_tx(cfg).init(g_params), d_opt=_d_tx(cfg).init(d_params),
        step=jnp.zeros((), jnp.int32),
    )


def _two_class_bce(logits, real: bool):
    """BCE against the one-hot rows y=[0,1] (real) / y=[1,0] (fake)
    (ref: sample_data_and_gen labels, nn.py:116-120)."""
    y = jnp.array([0.0, 1.0]) if real else jnp.array([1.0, 0.0])
    y = jnp.broadcast_to(y, logits.shape)
    return bce_with_logits(logits.reshape(-1), y.reshape(-1))


def softmax_gan_step(state: SoftmaxGANState, x_real: jnp.ndarray, key,
                     *, generator, discriminator, cfg: SoftmaxGANConfig,
                     measured=None, axis_name: str | None = None):
    """One epoch-step: D on [real; fake], then G toward the 'real' class."""
    kz1, kz2, kd = jax.random.split(key, 3)
    psum = (lambda t: jax.lax.pmean(t, axis_name)) if axis_name else (lambda t: t)

    z = jax.random.uniform(kz1, (x_real.shape[0], cfg.latent_dim))
    x_fake = generator.apply({"params": state.g_params}, z)
    if cfg.subtract_ht and measured is not None:
        x_fake = measured[None, :] - x_fake

    def d_loss_fn(dp):
        lr_ = discriminator.apply({"params": dp}, x_real, train=True, rngs={"dropout": kd})
        lf_ = discriminator.apply({"params": dp}, x_fake, train=True, rngs={"dropout": kd})
        return 0.5 * (_two_class_bce(lr_, True) + _two_class_bce(lf_, False))

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
    d_upd, d_opt = _d_tx(cfg).update(psum(d_grads), state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, d_upd)

    z2 = jax.random.uniform(kz2, (x_real.shape[0], cfg.latent_dim))

    def g_loss_fn(gp):
        xg = generator.apply({"params": gp}, z2)
        if cfg.subtract_ht and measured is not None:
            xg = measured[None, :] - xg
        lg = discriminator.apply({"params": d_params}, xg, train=True, rngs={"dropout": kd})
        return _two_class_bce(lg, True)

    g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
    g_upd, g_opt = _g_tx(cfg).update(psum(g_grads), state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_upd)

    new = SoftmaxGANState(g_params=g_params, d_params=d_params,
                          g_opt=g_opt, d_opt=d_opt, step=state.step + 1)
    return new, {"d_loss": psum(d_loss), "g_loss": psum(g_loss)}


def pretrain_discriminator(state: SoftmaxGANState, x_real, key, *, generator,
                           discriminator, cfg: SoftmaxGANConfig, measured=None):
    """One D-only pass before the alternating loop (ref: pretrain,
    nn.py:124-128)."""
    kz, kd = jax.random.split(key)
    z = jax.random.uniform(kz, (x_real.shape[0], cfg.latent_dim))
    x_fake = generator.apply({"params": state.g_params}, z)
    if cfg.subtract_ht and measured is not None:
        x_fake = measured[None, :] - x_fake

    def d_loss_fn(dp):
        lr_ = discriminator.apply({"params": dp}, x_real, train=True, rngs={"dropout": kd})
        lf_ = discriminator.apply({"params": dp}, x_fake, train=True, rngs={"dropout": kd})
        return 0.5 * (_two_class_bce(lr_, True) + _two_class_bce(lf_, False))

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
    d_upd, d_opt = _d_tx(cfg).update(d_grads, state.d_opt, state.d_params)
    return state.replace(
        d_params=optax.apply_updates(state.d_params, d_upd), d_opt=d_opt
    ), {"d_loss": d_loss}


def make_softmax_gan_step(generator, discriminator, cfg: SoftmaxGANConfig):
    return jax.jit(partial(softmax_gan_step, generator=generator,
                           discriminator=discriminator, cfg=cfg))
