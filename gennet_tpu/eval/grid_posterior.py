"""Analytic ground-truth posteriors on parameterized toy signals.

The reference's validation idiom #1 (SURVEY.md §4): for toys with known
likelihood, evaluate it exactly on a grid and compare the learned posterior
cloud against it (ref: burstMahoGANy.py:716-726; ganymede.py:578-588). The
reference looped one template per grid point on the host; here the whole
grid is one broadcast JAX expression.
"""

import jax.numpy as jnp
import numpy as np



def burst_grid_posterior(measured: jnp.ndarray, n_sig: float = 0.25, grain: int = 95,
                         t0_range=(0.25, 0.75), tau_range=(1.0 / 60.0, 1.0 / 15.0)):
    """Exact (t0, τ) likelihood grid for the sine-Gaussian burst workload.

    L ∝ exp(−½ Σ_t ((d − h(t0,τ)) / σ)²), normalized to max 1
    (ref: burstMahoGANy.py:716-726, grain=pe_grain=95).

    Returns (L[grain, grain] with axes (τ, t0) as the reference transposes,
    t0 grid, τ grid).
    """
    # host-side numpy: the grid is eval infrastructure (9k templates × n_pix
    # once per run) — keeping it off the accelerator avoids competing with
    # the training program for the device
    t0 = np.linspace(*t0_range, grain)
    tau = np.linspace(*tau_range, grain)
    T0, TAU = np.meshgrid(t0, tau, indexing="ij")
    N = measured.shape[-1]
    t = np.arange(N) / 512.0
    x = t[None, :] - T0.ravel()[:, None]
    tt = TAU.ravel()[:, None]
    # float64 host evaluation of physics.burst.sine_gaussian's formula
    templ = np.sin(2.0 * np.pi * 100.0 * x + 2.0 * np.pi) * np.exp(-(x**2) / tt**2)
    d = np.asarray(measured, np.float64).reshape(1, -1)
    logL = -0.5 * np.sum(((d - templ) / n_sig) ** 2, axis=-1)
    logL = logL.reshape(grain, grain).T  # (τ, t0), as the reference
    L = np.exp(logL - np.max(logL))
    return jnp.asarray(L), t0, tau


def bbh_grid_posterior(measured: jnp.ndarray, psd: jnp.ndarray, bank_cfg,
                       norm_constant: float, noise_sigma: float, grain: int = 95,
                       mc_range=(20.0, 35.0), q_range=(0.5, 1.0), chunk: int = 4096):
    """Exact (mc, q) likelihood grid for the SYNTHETIC flagship event.

    The synthetic measured event is built by this same pipeline
    (template_bank.make_event: event-twin template + N(0, σ) whitened noise,
    peak at the safe-window centre), so the Gaussian likelihood over a grid
    of templates synthesized at the same peak index is *exact* ground truth —
    the flagship analogue of the burst grid (ref: burstMahoGANy.py:716-726).
    Prior: uniform over the (mc, q) grid box (the likelihood dominates at
    GW150914-like SNR; the reference's comparison posterior carried
    lalinference's priors instead, ref: bbhMahoGANy.py:116-117).

    Returns (L[grain, grain] with axes (q, mc) — the (y, x) convention
    grid_overlap_score expects — mc grid, q grid).
    """
    from gennet_tpu.data import template_bank as tb
    from gennet_tpu.physics import priors

    mc = np.linspace(*mc_range, grain)
    q = np.linspace(*q_range, grain)
    MC, Q = np.meshgrid(mc, q, indexing="ij")
    m1, m2 = priors.mc_q_to_m1m2(jnp.asarray(MC.ravel(), jnp.float32),
                                 jnp.asarray(Q.ravel(), jnp.float32))
    n = int(m1.shape[0])
    d = jnp.asarray(measured).reshape(1, -1)

    pad = (-n) % chunk
    if pad:
        m1 = jnp.concatenate([m1, jnp.full((pad,), m1[0], m1.dtype)])
        m2 = jnp.concatenate([m2, jnp.full((pad,), m2[0], m2.dtype)])
    parts = []
    for i in range(0, n + pad, chunk):
        h = tb.make_templates_from_params(m1[i : i + chunk], m2[i : i + chunk],
                                          psd, bank_cfg, norm_constant)
        parts.append(-0.5 * jnp.sum(((d - h) / noise_sigma) ** 2, axis=-1))
    logL = np.asarray(jnp.concatenate(parts)[:n], np.float64).reshape(grain, grain)
    L = np.exp(logL - logL.max())
    return jnp.asarray(L.T), mc, q  # (q, mc) = (y, x), as the burst grid


def sample_grid_posterior(L: np.ndarray, x_grid: np.ndarray, y_grid: np.ndarray,
                          n: int, seed: int = 0) -> np.ndarray:
    """Draw (x, y) samples from a normalized grid posterior (categorical over
    cells + uniform jitter within each cell) — a stand-in reference cloud for
    β/KS/AD scoring when no lalinference posterior is mounted.

    ``L`` uses the (y, x) axis convention of the grid builders above.
    """
    rng = np.random.default_rng(seed)
    p = np.asarray(L, np.float64).T  # → (x, y)
    p = p / p.sum()
    flat_idx = rng.choice(p.size, size=n, p=p.ravel())
    ix, iy = np.unravel_index(flat_idx, p.shape)
    dx = x_grid[1] - x_grid[0] if len(x_grid) > 1 else 0.0
    dy = y_grid[1] - y_grid[0] if len(y_grid) > 1 else 0.0
    x = x_grid[ix] + rng.uniform(-0.5, 0.5, n) * dx
    y = y_grid[iy] + rng.uniform(-0.5, 0.5, n) * dy
    return np.stack([x, y], axis=-1)


def grid_moments(L: np.ndarray, x_grid: np.ndarray, y_grid: np.ndarray):
    """Mean and std of each parameter under a (y, x)-convention grid
    posterior — the exact-cloud moments a learned sample cloud should
    reproduce. Returns (mean_x, mean_y, std_x, std_y)."""
    p = np.asarray(L, np.float64).T  # → (x, y)
    p = p / p.sum()
    px = p.sum(axis=1)
    py = p.sum(axis=0)
    mx = float(np.dot(px, x_grid))
    my = float(np.dot(py, y_grid))
    sx = float(np.sqrt(np.dot(px, (x_grid - mx) ** 2)))
    sy = float(np.sqrt(np.dot(py, (y_grid - my) ** 2)))
    return mx, my, sx, sy


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
