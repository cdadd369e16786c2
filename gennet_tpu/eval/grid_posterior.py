"""Analytic ground-truth posteriors on parameterized toy signals.

The reference's validation idiom #1 (SURVEY.md §4): for toys with known
likelihood, evaluate it exactly on a grid and compare the learned posterior
cloud against it (ref: burstMahoGANy.py:716-726; ganymede.py:578-588). The
reference looped one template per grid point on the host; here the whole
grid is one broadcast JAX expression.
"""

import jax.numpy as jnp
import numpy as np

from gennet_tpu.physics.burst import sine_gaussian


def burst_grid_posterior(measured: jnp.ndarray, n_sig: float = 0.25, grain: int = 95,
                         t0_range=(0.25, 0.75), tau_range=(1.0 / 60.0, 1.0 / 15.0)):
    """Exact (t0, τ) likelihood grid for the sine-Gaussian burst workload.

    L ∝ exp(−½ Σ_t ((d − h(t0,τ)) / σ)²), normalized to max 1
    (ref: burstMahoGANy.py:716-726, grain=pe_grain=95).

    Returns (L[grain, grain] with axes (τ, t0) as the reference transposes,
    t0 grid, τ grid).
    """
    t0 = jnp.linspace(*t0_range, grain)
    tau = jnp.linspace(*tau_range, grain)
    T0, TAU = jnp.meshgrid(t0, tau, indexing="ij")
    templ = sine_gaussian(T0.ravel(), TAU.ravel(), N=measured.shape[-1])
    d = measured.reshape(1, -1)
    logL = -0.5 * jnp.sum(((d - templ) / n_sig) ** 2, axis=-1)
    logL = logL.reshape(grain, grain).T  # (τ, t0), as the reference
    L = jnp.exp(logL - jnp.max(logL))
    return L, np.asarray(t0), np.asarray(tau)


def grid_credible_interval(L: np.ndarray, levels=(0.68, 0.9, 0.99)):
    """Density thresholds enclosing the requested probability masses on a
    normalized grid posterior — the contour levels the reference found by
    bisection on a 2-D histogram (ref: make_contour_plot,
    bbhMahoGANy.py:752-784), computed directly by sorting."""
    L = np.asarray(L, np.float64)
    p = L / L.sum()
    flat = np.sort(p.ravel())[::-1]
    csum = np.cumsum(flat)
    out = []
    for lv in levels:
        k = int(np.searchsorted(csum, lv))
        out.append(flat[min(k, flat.size - 1)] * L.sum())
    return out


def grid_overlap_score(samples: np.ndarray, L: np.ndarray, x_grid: np.ndarray, y_grid: np.ndarray) -> float:
    """β-style overlap between a sample cloud and an analytic grid posterior:
    KDE the samples, evaluate on the grid, cosine-similarity with L.

    Quantifies the reference's visual "samples sit on the true contours"
    check (SURVEY.md §4.1) as a pytest-able score in [0, 1].
    """
    from gennet_tpu.eval.overlap import gaussian_kde_pdf

    X, Y = np.meshgrid(x_grid, y_grid, indexing="ij")
    pts = np.vstack([X.ravel(), Y.ravel()])
    pk = gaussian_kde_pdf(np.asarray(samples, np.float64).T, pts).reshape(len(x_grid), len(y_grid))
    Lg = np.asarray(L, np.float64).T  # back to (t0/x, tau/y) axes
    num = float((pk * Lg).sum())
    den = float(np.sqrt((pk**2).sum() * (Lg**2).sum()))
    return num / den if den > 0 else 0.0
