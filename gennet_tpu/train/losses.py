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


def residual_spectral_loss(residual: jnp.ndarray, n_sig: float,
                           n_bands: int) -> jnp.ndarray:
    """Frequency-resolved whiteness target for the subtraction route.

    The 2-moment loss (mean + variance) is satisfiable without subtracting
    the signal at BBH SNRs — measured r4: a generator emitting near-zero
    waveforms reaches res_loss ~1e-3 while its posterior sits 50σ off the
    truth. The discriminating statistic the pair scheme's channel 2 was
    (pathologically) learning is the residual's detailed whiteness; for
    KNOWN white N(0, n_sig²) noise that test needs no adversary: under
    Wiener–Khinchin, matching the band-averaged periodogram to the flat
    noise floor constrains every autocorrelation scale at once — the
    differentiable analog of the χ² time-frequency veto.

    Splits the positive-frequency periodogram into ``n_bands`` equal bands
    and MSEs each band's mean power against the white-noise expectation,
    plus the mean/DC term. Normalized so a true N(0, n_sig²) residual gives
    E[loss] ≈ n_bands/(bins·batch) (small, floor-limited), while an
    unsubtracted compact-binary signal concentrates its excess power in few
    bands and pays ~(SNR²/bins_band)² there. rfft of a (B, n_pix) batch is
    a single XLA kernel on TPU; cost is negligible next to the G pass.
    """
    r = residual.reshape(residual.shape[0], -1)
    n = r.shape[-1]
    # periodogram normalized so E[p_k] = n_sig² for white N(0, n_sig²)
    # input (E[|X_k|²] = n·σ² at interior bins; drop DC and Nyquist — the
    # mean term below covers DC)
    spec = jnp.fft.rfft(r, axis=-1)[:, 1:-1]
    p = (jnp.abs(spec) ** 2) / n
    # clamp: with n_bands > retained bins (tiny test n_pix) the truncated
    # bin count would hit 0 and the empty-axis mean returns NaN (ADVICE r4)
    nb = max(1, min(int(n_bands), p.shape[-1]))
    bins = p.shape[-1] - (p.shape[-1] % nb)
    bands = p[:, :bins].reshape(r.shape[0], nb, -1).mean(axis=-1)
    m1 = jnp.mean(r, axis=-1)
    band_err = jnp.mean((bands - n_sig**2) ** 2)
    return jnp.mean(m1**2) + band_err
