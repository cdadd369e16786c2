"""PSD whitening in the frequency and time domains.

Replaces the reference's `whiten_data` (ref: gw_template_maker.py:243-286):
``x̃ → x̃ · sqrt(2/(psd·fs))`` with undefined-PSD bins and the DC bin zeroed,
and for time-domain input a Tukey(α=1/8) window applied before the rFFT.

Everything is batched/vmappable: the leading axes of ``data`` broadcast
against a single shared PSD, so whitening a 50k-template bank is one fused
XLA FFT batch on the TPU.
"""

import jax.numpy as jnp

from gennet_tpu.physics.windows import tukey


def _inverse_psd(psd: jnp.ndarray) -> jnp.ndarray:
    """1/psd with zero (or negative/NaN) bins mapped to 0, as the reference
    does via index masking (ref: gw_template_maker.py:272-275)."""
    good = psd > 0.0
    safe = jnp.where(good, psd, 1.0)
    return jnp.where(good, 1.0 / safe, 0.0)


def whiten_fd(data_fd: jnp.ndarray, psd: jnp.ndarray, sample_rate: float) -> jnp.ndarray:
    """Whiten a frequency-domain series (rfft layout, length N//2+1).

    ``data_fd``: complex array, trailing axis = frequency bins.
    ``psd``: one-sided PSD on the same bins.
    """
    invpsd = _inverse_psd(psd)
    xf = data_fd * jnp.sqrt(2.0 * invpsd / sample_rate)
    # no DC component (ref: gw_template_maker.py:279)
    return xf.at[..., 0].set(0.0)


def whitening_gain(psd: jnp.ndarray, sample_rate: float) -> jnp.ndarray:
    """The real per-bin whitening gain sqrt(2/(psd·fs)) with undefined bins
    (and DC) zeroed — for the TPU-native amp/phase pipeline, where whitening
    is a pure amplitude scale (h̃ = amp·e^{−iΨ} → (amp·gain)·e^{−iΨ})."""
    gain = jnp.sqrt(2.0 * _inverse_psd(psd) / sample_rate)
    return gain.at[..., 0].set(0.0)


def whiten_td(data: jnp.ndarray, psd: jnp.ndarray, sample_rate: float, alpha: float = 1.0 / 8.0) -> jnp.ndarray:
    """Whiten a time-domain series: Tukey window → rfft → whiten → irfft.

    The trailing axis is time; its static length fixes the window and FFT
    size (ref: gw_template_maker.py:265-284).
    """
    n = data.shape[-1]
    win = tukey(n, alpha=alpha, dtype=data.dtype)
    xf = jnp.fft.rfft(win * data, axis=-1)
    xf = whiten_fd(xf, psd, sample_rate)
    return jnp.fft.irfft(xf, n, axis=-1)
