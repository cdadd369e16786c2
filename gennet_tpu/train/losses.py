"""Loss functions."""

import jax.numpy as jnp
from jax import nn as jnn


def bce_with_logits(logits: jnp.ndarray, labels) -> jnp.ndarray:
    """Numerically-stable binary cross-entropy on logits (the reference used
    Keras 'binary_crossentropy' on sigmoid outputs, ref: bbhMahoGANy.py:1101,
    1107,1115 — identical loss, stable formulation)."""
    logits = logits.reshape(-1)
    labels = jnp.broadcast_to(jnp.asarray(labels, logits.dtype), logits.shape)
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels + jnn.softplus(-jnp.abs(logits))
    )


def binary_accuracy(logits: jnp.ndarray, labels) -> jnp.ndarray:
    """Fraction of (sigmoid(logit) > 0.5) predictions matching labels — the
    reference's Keras 'accuracy' metric on the GAN heads."""
    logits = logits.reshape(-1)
    labels = jnp.broadcast_to(jnp.asarray(labels, logits.dtype), logits.shape)
    pred = (logits > 0.0).astype(logits.dtype)
    return jnp.mean((pred == jnp.round(labels)).astype(logits.dtype))


def chisquare_loss(probs: jnp.ndarray, labels, n_sig: float = 1.0) -> jnp.ndarray:
    """The reference's optional χ² GAN loss: sum((y−ŷ)²/n_sig²) over the
    output axis, averaged over the batch (ref: chisquare_Loss,
    bbhMahoGANy.py:146-162). ``probs`` are sigmoid outputs."""
    probs = probs.reshape(probs.shape[0], -1)
    labels = jnp.broadcast_to(jnp.asarray(labels, probs.dtype), probs.shape)
    return jnp.mean(jnp.sum((labels - probs) ** 2 / n_sig**2, axis=-1))


def mse_multi_output(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Keras multi-output MSE as the reference's PE nets use it: per-output
    mean squared error, summed over outputs (ref: bbhMahoGANy.py:1119,1165)."""
    return jnp.sum(jnp.mean((pred - target) ** 2, axis=0))


def residual_moment_loss(residual: jnp.ndarray, n_sig: float) -> jnp.ndarray:
    """The data-subtraction route's target: residual mean → 0 and mean square
    → n_sig² via MSE on the two moments (ref: MyLayer burst variant +
    ny targets, burstMahoGANy.py:116-120,798-802)."""
    m1 = jnp.mean(residual, axis=tuple(range(1, residual.ndim)))
    m2 = jnp.mean(residual**2, axis=tuple(range(1, residual.ndim)))
    return jnp.mean(0.5 * (m1**2 + (m2 - n_sig**2) ** 2))
