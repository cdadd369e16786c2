"""Gaussian noise synthesis (white and PSD-colored), fully on-device.

Replaces the reference's host-numpy `gen_noise` (ref:
gw_template_maker.py:161-193) with `jax.random`-keyed, batchable versions —
noise for a whole training batch is one traced op inside the jitted train
step, never a host round trip (the reference crosses the host boundary every
iteration, bbhMahoGANy.py:1277).
"""

import jax
import jax.numpy as jnp


def white_noise(key: jax.Array, shape, sigma: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """Unit-variance (×sigma) Gaussian noise — the whitened-domain noise model
    the GAN assumes (ref: bbhMahoGANy.py:85,1277)."""
    return sigma * jax.random.normal(key, shape, dtype)


def colored_noise(key: jax.Array, psd: jnp.ndarray, T_obs: float, fs: float, batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Colored Gaussian noise realization(s) from a one-sided PSD.

    Frequency-domain amplitude ``sqrt(T·psd/4)`` per real/imag quadrature,
    zeroed DC and zero-PSD bins, then ``N · irfft(...) · df``
    (ref: gen_noise, gw_template_maker.py:179-193).

    Returns shape ``batch_shape + (N,)`` with ``N = T_obs*fs``.
    """
    N = int(T_obs * fs)
    Nf = N // 2 + 1
    df = 1.0 / T_obs

    amp = jnp.sqrt(0.25 * T_obs * psd)
    amp = jnp.where(psd == 0.0, 0.0, amp)

    kr, ki = jax.random.split(key)
    re = amp * jax.random.normal(kr, (*batch_shape, Nf), dtype)
    im = amp * jax.random.normal(ki, (*batch_shape, Nf), dtype)
    re = re.at[..., 0].set(0.0)
    im = im.at[..., 0].set(0.0)
    return N * jnp.fft.irfft(re + 1j * im, N, axis=-1).astype(dtype) * df
