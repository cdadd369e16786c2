"""2-D image GAN + PE models — the gen-1 (ganymede) family.

ref: tests/ganymede.py:74-261 — DCGAN-style generator/discriminator over
n_pix×n_pix greyscale images, a conv PE net, and its MC-dropout variant (the
1-D MC-dropout PE lives in cnn_pe.MCDropoutPE; this is the 2-D original).
"""

import jax.numpy as jnp
from flax import linen as nn

from gennet_tpu.models.layers import PermaDropout


class ImageGenerator(nn.Module):
    """latent → Dense → reshape (n/4, n/4, 128) → BN/tanh → Up2+Conv(64)
    → Up2+Conv(1) tanh (ref: ganymede.py:74-117 DCGAN shape)."""

    n_pix: int = 28
    latent_dim: int = 100
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, z, train: bool = False):
        q = self.n_pix // 4
        x = nn.Dense(1024)(z)
        x = jnp.tanh(x)
        x = nn.Dense(128 * q * q)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum)(x)
        x = jnp.tanh(x)
        x = x.reshape((x.shape[0], q, q, 128))
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = jnp.tanh(nn.Conv(64, (5, 5), padding="SAME")(x))
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = jnp.tanh(nn.Conv(1, (5, 5), padding="SAME")(x))
        return x  # (B, n_pix, n_pix, 1)


class ImageDiscriminator(nn.Module):
    """Conv(64,5) tanh → maxpool → Conv(128,5) tanh → maxpool → Dense(1024)
    tanh → Dense(1) (ref: ganymede.py:211-239)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = jnp.tanh(nn.Conv(64, (5, 5), padding="SAME")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.tanh(nn.Conv(128, (5, 5), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = jnp.tanh(nn.Dense(1024)(x))
        return nn.Dense(1)(x)  # logits


class FlatImageGenerator(nn.Module):
    """ImageGenerator emitting a flattened (B, n_pix², 1) series so the
    image workloads plug into the shared 1-D GAN step unchanged (the
    subtraction/residual math is elementwise and shape-agnostic)."""

    n_pix: int = 28
    latent_dim: int = 100

    @nn.compact
    def __call__(self, z, train: bool = False):
        img = ImageGenerator(n_pix=self.n_pix, latent_dim=self.latent_dim)(z, train=train)
        return img.reshape((z.shape[0], -1, 1))


class FlatImageDiscriminator(nn.Module):
    """ImageDiscriminator over flattened (B, n_pix², C) input."""

    n_pix: int = 28

    @nn.compact
    def __call__(self, x, train: bool = False):
        img = x.reshape((x.shape[0], self.n_pix, self.n_pix, -1))
        return ImageDiscriminator()(img, train=train)


class ImagePE(nn.Module):
    """Conv PE: image → (x, y) blob-centre estimate (ref: ganymede.py:141-173)."""

    npar: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = jnp.tanh(nn.Conv(64, (5, 5), padding="SAME")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.tanh(nn.Conv(128, (5, 5), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = jnp.tanh(nn.Dense(1024)(x))
        return nn.Dense(self.npar)(x)


class ImageMCDropoutPE(nn.Module):
    """MC-dropout variant: PermaDropout after each block stays stochastic at
    inference; 1000 repeated predictions of one image draw an approximate
    posterior (ref: ganymede.py:175-209,617-620)."""

    npar: int = 2
    rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.tanh(nn.Conv(64, (5, 5), padding="SAME")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = PermaDropout(self.rate)(x)
        x = jnp.tanh(nn.Conv(128, (5, 5), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = PermaDropout(self.rate)(x)
        x = jnp.tanh(nn.Dense(1024)(x))
        x = PermaDropout(self.rate)(x)
        return nn.Dense(self.npar)(x)
