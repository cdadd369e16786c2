"""Shared building blocks for the model zoo."""

import jax
import jax.numpy as jnp
from flax import linen as nn


class GaussianDropout(nn.Module):
    """Multiplicative Gaussian noise ×N(1, rate/(1−rate)) — Keras
    GaussianDropout semantics (ref: burstMahoGANy.py:174,181,188,195)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        sigma = (self.rate / (1.0 - self.rate)) ** 0.5
        rng = self.make_rng("dropout")
        return x * (1.0 + sigma * jax.random.normal(rng, x.shape, x.dtype))


class PermaDropout(nn.Module):
    """Dropout active at train AND inference — the reference's MC-dropout PE
    trick (ref: ganymede.py:67-72). Always stochastic; requires a 'dropout'
    rng whenever called."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic  # intentionally ignored — that's the point
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)


def upsample1d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Keras UpSampling1D: nearest-neighbour repeat along the length axis
    (ref: bbhMahoGANy.py:249,258)."""
    return jnp.repeat(x, factor, axis=-2)


def activation(name: str):
    return {
        "tanh": jnp.tanh,
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "linear": lambda x: x,
        "sigmoid": nn.sigmoid,
        "elu": nn.elu,
    }[name]
