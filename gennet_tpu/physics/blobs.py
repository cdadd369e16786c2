"""Parameterized 2-D Gaussian-blob images — the gen-1 toy signal model.

Replaces `gen_gauss_signals` (ref: tests/ganymede.py:316-342): images of a
2-D Gaussian pdf with random mean location, renormalized to [−1, 1]. The
reference loops scipy multivariate_normal per image on the host; here the
whole set is one broadcast expression.
"""

import jax
import jax.numpy as jnp


def gauss_blob_images(means: jnp.ndarray, n_pix: int = 28, blob_scale: float = 0.1) -> jnp.ndarray:
    """Images for blob centres ``means`` (…, 2) in fractional [0,1] coords.

    pdf with covariance (blob_scale·n_pix)² I, renormalized per-image to
    [−1, 1] (ref: renorm + mvn.pdf, ganymede.py:333-336). Returns
    (…, n_pix, n_pix).
    """
    xy = jnp.stack(
        jnp.meshgrid(jnp.arange(n_pix), jnp.arange(n_pix), indexing="ij"), axis=-1
    ).astype(jnp.float32)  # (n, n, 2)
    mu = means[..., None, None, :] * n_pix
    var = (blob_scale * n_pix) ** 2
    d2 = jnp.sum((xy - mu) ** 2, axis=-1)
    img = jnp.exp(-0.5 * d2 / var)  # ∝ pdf; renorm makes the constant moot
    lo = jnp.min(img, axis=(-2, -1), keepdims=True)
    hi = jnp.max(img, axis=(-2, -1), keepdims=True)
    half = 0.5 * (hi - lo)
    mid = 0.5 * (hi + lo)
    return (img - mid) / jnp.maximum(half, 1e-12)


def make_blob_bank(key: jax.Array, n: int, n_pix: int = 28, blob_scale: float = 0.1):
    """n random-blob images + their fractional (x, y) means
    (ref: ganymede.py:327-340)."""
    means = jax.random.uniform(key, (n, 2))
    return gauss_blob_images(means, n_pix, blob_scale), means


def blob_grid_posterior(measured: jnp.ndarray, n_sig: float, grain: int = 28, blob_scale: float = 0.1):
    """Exact likelihood of blob-centre location on a grain×grain grid
    (ref: ganymede.py:578-588)."""
    n_pix = measured.shape[-1]
    g = jnp.linspace(0.0, 1.0, grain)
    GX, GY = jnp.meshgrid(g, g, indexing="ij")
    means = jnp.stack([GX.ravel(), GY.ravel()], -1)
    templ = gauss_blob_images(means, n_pix, blob_scale)
    logL = -0.5 * jnp.sum(((measured[None] - templ) / n_sig) ** 2, axis=(-2, -1))
    logL = logL.reshape(grain, grain).T
    return jnp.exp(logL - jnp.max(logL)), g, g
