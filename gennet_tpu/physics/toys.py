"""Sinusoid toy signal models (gen-2/3 prototypes).

ref: train_on_wvf_version/nn.py:57-69 (`sample_data`) and
Gauss_pulse_testing/orig_rricard_model/* (`sin(offset + 2πt/5)` toys).
"""

import jax
import jax.numpy as jnp


def sample_sinusoids(key: jax.Array, n: int, n_out: int = 50, x_max: float = 5.0,
                     max_offset: float = 100.0, mul_range=(1.0, 2.0)):
    """Random-phase/frequency sinusoids in [0, 1]:
    sin(offset + x·mul)/2 + 0.5 on x = arange(0, x_max, 0.1)
    (ref: nn.py:57-69)."""
    k1, k2 = jax.random.split(key)
    x = jnp.arange(0.0, x_max, x_max / n_out)
    offset = jax.random.uniform(k1, (n, 1), maxval=max_offset)
    mul = jax.random.uniform(k2, (n, 1), minval=mul_range[0], maxval=mul_range[1])
    return jnp.sin(offset + x[None, :] * mul) / 2.0 + 0.5


def gauss_pulse(key: jax.Array, n: int, n_out: int = 512, fc: float = 50.0, bw: float = 0.3):
    """Gaussian-modulated sinusoid pulses (scipy.signal.gausspulse analogue,
    ref: Gauss_pulse_testing/orig_rricard_model/scipy_guasspulse.py)."""
    t0 = jax.random.uniform(key, (n, 1), minval=0.3, maxval=0.7)
    t = jnp.linspace(0.0, 1.0, n_out)[None, :]
    # gausspulse: exp(-a t²) cos(2π fc t), a = (π fc bw)²/(4 ln 2)
    a = (jnp.pi * fc * bw) ** 2 / (4.0 * jnp.log(2.0))
    x = t - t0
    return jnp.exp(-a * x**2) * jnp.cos(2 * jnp.pi * fc * x)
