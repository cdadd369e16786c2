"""Matched-filter SNR utilities.

The reference's ``bbhparams`` carries (snr, SNR) fields that are never
populated (ref: gw_template_maker.py:440, always None); here the quantities
are actually computable — useful for bank diagnostics and event
characterization.
"""

import jax.numpy as jnp


def optimal_snr_fd(amp: jnp.ndarray, psd: jnp.ndarray, T_obs: float) -> jnp.ndarray:
    """Optimal SNR ρ = sqrt(4 Σ |h̃(f)|²/S(f) df) from an FD amplitude
    (continuous-FT convention, scaled strain units like the PSD).

    ``amp`` may be batched (…, Nf); psd (Nf,).
    """
    df = 1.0 / T_obs
    good = psd > 0
    integrand = jnp.where(good, amp**2 / jnp.where(good, psd, 1.0), 0.0)
    return jnp.sqrt(4.0 * jnp.sum(integrand, axis=-1) * df)


def whitened_snr(whitened: jnp.ndarray) -> jnp.ndarray:
    """SNR of a whitened (unit-noise-variance discrete) template:
    ρ = sqrt(Σ_t s_w[t]²). Batched over leading axes."""
    return jnp.sqrt(jnp.sum(whitened**2, axis=-1))
