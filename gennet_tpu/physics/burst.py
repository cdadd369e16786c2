"""Analytic sine-Gaussian burst signals — the smoke workload's signal model.

Replaces `make_burst_waveforms` (ref: tests/burstMahoGANy.py:76-98): the
reference loops one waveform at a time on the host; here a whole bank is one
broadcasted expression, so 50k signals synthesize in a single fused XLA op.
"""

import jax
import jax.numpy as jnp


def sine_gaussian(
    t0: jnp.ndarray,
    tau: jnp.ndarray,
    amp: float = 1.0,
    freq: float = 100.0,
    dt: float = 1.0 / 512,
    N: int = 512,
    phi: float = 2.0 * jnp.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """h(t) = A sin(2π f (t−t0) + φ) exp(−(t−t0)²/τ²).

    ``t0``/``tau`` may be scalars or arrays of matching shape; output gains a
    trailing time axis of length ``N``. Defaults match the reference's
    (ref: burstMahoGANy.py:76).
    """
    t0 = jnp.asarray(t0, dtype)[..., None]
    tau = jnp.asarray(tau, dtype)[..., None]
    t = (dt * jnp.arange(N)).astype(dtype)
    x = t - t0
    return (amp * jnp.sin(2.0 * jnp.pi * freq * x + phi) * jnp.exp(-(x**2) / tau**2)).astype(dtype)


def sample_burst_params(key: jax.Array, n: int, t0_range=(0.25, 0.75), tau_range=(1.0 / 60.0, 1.0 / 15.0), dtype=jnp.float32):
    """Draw (t0, tau) uniformly — the reference's ``rand5`` prior
    (ref: burstMahoGANy.py:83-86). Returns an (n, 2) array."""
    k1, k2 = jax.random.split(key)
    t0 = jax.random.uniform(k1, (n,), dtype, *t0_range)
    tau = jax.random.uniform(k2, (n,), dtype, *tau_range)
    return jnp.stack([t0, tau], axis=-1)


def make_burst_bank(key: jax.Array, n: int, N: int = 512, dtype=jnp.float32):
    """Generate a bank of n sine-Gaussian signals + their (t0, tau) params —
    the smoke-workload training set (ref: burstMahoGANy.py:581)."""
    pars = sample_burst_params(key, n, dtype=dtype)
    bank = sine_gaussian(pars[:, 0], pars[:, 1], N=N, dtype=dtype)
    return bank, pars
