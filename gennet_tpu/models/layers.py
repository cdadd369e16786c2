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


class PallasConv1D(nn.Module):
    """SAME-padded 1-D convolution backed by the Pallas MXU kernel
    (`gennet_tpu.ops.pallas_conv1d`). Parameter names and shapes match
    `nn.Conv` exactly — 'kernel' (K, Cin, Cout), 'bias' (Cout,) — so
    checkpoints are interchangeable between the two implementations.

    Output is linear (activation applied by the caller, as with nn.Conv).
    On non-TPU backends the kernel runs in interpret mode, which is
    correct but slow — select this module only on TPU hot paths."""

    features: int
    kernel_size: int = 5
    strides: int = 1
    bl: int = 256       # row-tile (length) block
    bc: int = 256       # lane-tile (out-channel) block

    @nn.compact
    def __call__(self, x):
        from gennet_tpu.ops.pallas_conv1d import conv1d_train

        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel_size, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        interpret = jax.default_backend() != "tpu"
        y = conv1d_train(jnp.asarray(x, jnp.float32), w, b,
                         self.bl, self.bc, interpret)
        if self.strides == 1:
            return y
        # SAME stride-s sampling of the stride-1 output (slice is
        # differentiable; offset math matches ops.pallas_conv1d.conv1d)
        L, K, s = x.shape[1], self.kernel_size, self.strides
        out_len = -(-L // s)
        pad_low = max((out_len - 1) * s + K - L, 0) // 2
        off = (K - 1) // 2 - pad_low
        return y[:, off::s, :][:, :out_len, :]


def conv1d_layer(impl: str, features: int, kernel_size: int = 5,
                 strides: int = 1, dtype=None, name: str = None):
    """Factory selecting the conv implementation for model hot layers:
    'xla' → flax nn.Conv; 'pallas' → PallasConv1D (float32). Callers pass
    an explicit `name` (e.g. "Conv_0") so the param path — not just the
    leaf shapes — is identical under both implementations and checkpoints
    swap freely between them."""
    if impl == "pallas":
        return PallasConv1D(features, kernel_size=kernel_size,
                            strides=strides, name=name)
    return nn.Conv(features, (kernel_size,), strides=(strides,),
                   padding="SAME", dtype=dtype, name=name)


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
