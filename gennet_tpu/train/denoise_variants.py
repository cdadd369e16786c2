"""Gen-2 method-ablation variants (ref: Gauss_pulse_testing/orig_rricard_model/).

Two prototype ideas the reference kept as ablations:

- **Autoencoder latent** (ref: sine_subtract.py:223-260): a small dense
  autoencoder is trained to reconstruct clean signals; its encoder maps
  (noisy) signals into the GAN's latent space, replacing the random latent.
- **"Stark approach"** (ref: stark_approach.py:143-163): the generator is a
  denoiser — its input is the noisy measured signal itself rather than a
  latent vector; the discriminator judges G(signal+noise) against clean
  signals.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn, struct

from gennet_tpu.train.losses import bce_with_logits


class SignalAutoencoder(nn.Module):
    """Dense AE: n_out → encoding_dim (relu) → n_out (sigmoid)
    (ref: make_autoencoder, sine_subtract.py:223-251)."""

    n_out: int = 50
    encoding_dim: int = 10

    @nn.compact
    def __call__(self, x):
        z = nn.relu(nn.Dense(self.encoding_dim, name="encoder")(x))
        return nn.sigmoid(nn.Dense(self.n_out, name="decoder")(z)), z

    def encode(self, variables, x):
        """Encoder half only — the GAN latent provider."""
        kernel = variables["params"]["encoder"]
        return nn.relu(x @ kernel["kernel"] + kernel["bias"])


def train_autoencoder(key, model: SignalAutoencoder, x_train: jnp.ndarray,
                      epochs: int = 100, batch_size: int = 32, lr: float = 1e-2):
    """Reconstruction training with BCE (the reference used adadelta+BCE,
    ref: train_autoencoder, sine_subtract.py:253-260); adam here — the AE is
    a 2-layer dense net where the optimizer choice is immaterial."""
    variables = model.init({"params": key}, x_train[:1])
    tx = optax.adam(lr)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt, x, k):
        idx = jax.random.randint(k, (batch_size,), 0, x.shape[0])
        xb = x[idx]

        def loss_fn(p):
            recon, _ = model.apply({"params": p}, xb)
            eps = 1e-7
            r = jnp.clip(recon, eps, 1 - eps)
            return -jnp.mean(xb * jnp.log(r) + (1 - xb) * jnp.log(1 - r))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    params = variables["params"]
    loss = jnp.inf
    for i in range(epochs):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, x_train, sub)
    return {"params": params}, float(loss)


class DenoiserGenerator(nn.Module):
    """Stark-approach generator: noisy signal in → clean estimate out
    (dense stack, tanh output like the gen-3 generator)."""

    n_out: int = 50

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        h = nn.relu(nn.Dense(300)(x))
        h = nn.relu(nn.Dense(150)(h))
        return jnp.tanh(nn.Dense(self.n_out)(h))


@dataclass(frozen=True)
class DenoiserGANConfig:
    n_out: int = 50
    batch_size: int = 32
    noise_level: float = 0.2       # ref hyperparams.noise_level
    g_lr: float = 1e-3
    d_lr: float = 1e-4


class DenoiserGANState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def init_denoiser_gan(key, generator, discriminator, cfg: DenoiserGANConfig):
    kg, kd = jax.random.split(key)
    g_params = generator.init({"params": kg}, jnp.zeros((1, cfg.n_out)))["params"]
    d_params = discriminator.init(
        {"params": kd, "dropout": kd}, jnp.zeros((1, cfg.n_out)), train=False
    )["params"]
    return DenoiserGANState(
        g_params=g_params, d_params=d_params,
        g_opt=optax.adam(cfg.g_lr).init(g_params),
        d_opt=optax.adam(cfg.d_lr).init(d_params),
        step=jnp.zeros((), jnp.int32),
    )


def denoiser_gan_step(state: DenoiserGANState, x_real: jnp.ndarray, key,
                      *, generator, discriminator, cfg: DenoiserGANConfig):
    """fake = G(signal + U(−lvl, lvl) noise); D separates clean real signals
    from denoised fakes; G trained to fool D (two-class labels like gen-3)."""
    kn, kd, kn2 = jax.random.split(key, 3)
    noisy = x_real + jax.random.uniform(
        kn, x_real.shape, minval=-cfg.noise_level, maxval=cfg.noise_level
    )

    def two_class(logits, real):
        y = jnp.array([0.0, 1.0]) if real else jnp.array([1.0, 0.0])
        return bce_with_logits(logits.reshape(-1), jnp.broadcast_to(y, logits.shape).reshape(-1))

    x_fake = generator.apply({"params": state.g_params}, noisy)

    def d_loss_fn(dp):
        lr_ = discriminator.apply({"params": dp}, x_real, train=True, rngs={"dropout": kd})
        lf_ = discriminator.apply({"params": dp}, x_fake, train=True, rngs={"dropout": kd})
        return 0.5 * (two_class(lr_, True) + two_class(lf_, False))

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
    upd, d_opt = optax.adam(cfg.d_lr).update(d_grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, upd)

    noisy2 = x_real + jax.random.uniform(
        kn2, x_real.shape, minval=-cfg.noise_level, maxval=cfg.noise_level
    )

    def g_loss_fn(gp):
        xg = generator.apply({"params": gp}, noisy2)
        lg = discriminator.apply({"params": d_params}, xg, train=True, rngs={"dropout": kd})
        return two_class(lg, True)

    g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
    upd, g_opt = optax.adam(cfg.g_lr).update(g_grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, upd)

    return DenoiserGANState(g_params=g_params, d_params=d_params, g_opt=g_opt,
                            d_opt=d_opt, step=state.step + 1), {
        "d_loss": d_loss, "g_loss": g_loss,
    }


def make_denoiser_gan_step(generator, discriminator, cfg: DenoiserGANConfig):
    return jax.jit(partial(denoiser_gan_step, generator=generator,
                           discriminator=discriminator, cfg=cfg))
