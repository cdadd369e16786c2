"""Plotting dashboards — the reference's full visual-regression set.

Regenerates every figure family the reference emits at training cadence
(SURVEY.md §5.5): loss/accuracy curves with the logit-rescaled accuracy axis
(ref: plot_losses, bbhMahoGANy.py:541-590), true-vs-estimated PE scatter
(ref: plot_pe_accuracy, :592-621), posterior corner scatter with marginal
histograms and 68/90/99% KDE contours (ref: plot_pe_samples +
make_contour_plot, :623-795), waveform percentile bands + residuals (ref:
plot_waveform_est, :875-957), and the β-score history (ref: :1356-1359).
A ``latest/`` subdirectory keeps most-recent copies (ref: :620,720,944).
"""

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _logit(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


def _save(fig, out_path, fname, latest_name=None):
    os.makedirs(out_path, exist_ok=True)
    fig.savefig(os.path.join(out_path, fname), dpi=200)
    if latest_name:
        latest = os.path.join(out_path, "latest")
        os.makedirs(latest, exist_ok=True)
        fig.savefig(os.path.join(latest, latest_name), dpi=200)
    plt.close(fig)


def plot_losses(history: dict, out_path: str, fname: str = "losses.png",
                logscale: bool = False, legend=None):
    """Loss curves (top) + logit-rescaled accuracy curves (bottom), as the
    reference plots GAN/PE histories (ref: plot_losses, :541-590).

    history: dict of 1-D arrays; keys ending in '_loss' go to the top panel,
    '_acc' to the bottom.
    """
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 6))
    for k, v in history.items():
        if k.endswith("_loss") and len(v):
            ax1.plot(v, label=k, linewidth=0.7)
    ax1.set_xlabel("iteration")
    ax1.set_ylabel("loss")
    if legend or True:
        ax1.legend(loc="upper left", fontsize=7)
    if logscale:
        ax1.set_xscale("log")
        ax1.set_yscale("log")

    ticks = [0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999]
    for k, v in history.items():
        if k.endswith("_acc") and len(v):
            ax2.plot(_logit(np.asarray(v)), label=k, linewidth=0.7)
    ax2.set_yticks(_logit(np.asarray(ticks)))
    ax2.set_yticklabels([str(t) for t in ticks])
    ax2.set_xlabel("iteration")
    ax2.set_ylabel("accuracy")
    ax2.legend(loc="lower right", fontsize=7)
    _save(fig, out_path, fname)


def plot_pe_accuracy(true_pars, est_pars, out_path, fname="pe_accuracy.png"):
    """True-vs-estimated scatter per parameter (ref: :592-621)."""
    true_pars = np.asarray(true_pars)
    est_pars = np.asarray(est_pars)
    fig, axes = plt.subplots(1, true_pars.shape[1], figsize=(5 * true_pars.shape[1], 5))
    axes = np.atleast_1d(axes)
    for p, ax in enumerate(axes):
        ax.plot(true_pars[:, p], est_pars[:, p], ".b", markersize=0.5)
        m = float(np.max(true_pars[:, p]))
        ax.plot([0, m], [0, m], "--k")
        ax.set_xlabel(f"True parameter {p + 1}")
        ax.set_ylabel(f"Estimated parameter {p + 1}")
        ax.set_aspect("equal", adjustable="box")
    _save(fig, out_path, fname, "pe_accuracy.png")


def _kde_contours(ax, samples, color):
    """68/90/99% credible contours of a 2-D sample cloud via KDE on a
    100×100 grid (ref: make_contour_plot, :752-792, with the bisection level
    search replaced by direct sorted-mass thresholds)."""
    from gennet_tpu.eval.overlap import gaussian_kde_pdf

    x, y = samples[:, 0], samples[:, 1]
    gx = np.linspace(x.min(), x.max(), 100)
    gy = np.linspace(y.min(), y.max(), 100)
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    Z = gaussian_kde_pdf(samples.T, np.vstack([X.ravel(), Y.ravel()])).reshape(100, 100)
    p = Z / Z.sum()
    flat = np.sort(p.ravel())[::-1]
    csum = np.cumsum(flat)
    levels = sorted(
        {float(flat[min(int(np.searchsorted(csum, lv)), flat.size - 1)] * Z.sum()) for lv in (0.99, 0.9, 0.68)}
    )
    if len(levels) >= 2:
        ax.contour(X, Y, Z, levels=levels, colors=color, alpha=0.5)


def plot_pe_samples(pe_samples, truth, out_path, index=0, ref_samples=None,
                    pe_std=None, grid=None, fname=None):
    """Posterior corner plot: scatter + contours + marginal histograms +
    truth crosshairs; returns the β overlap vs ref_samples when provided
    (ref: plot_pe_samples, :623-724 — the return value feeds the β history).
    Optionally underlays an analytic grid posterior (burst workload,
    ref: burstMahoGANy.py:725)."""
    from gennet_tpu.eval.overlap import beta_overlap

    fig = plt.figure(figsize=(7, 7))
    ax1 = fig.add_subplot(223)
    beta = None

    pe_samples = None if pe_samples is None else np.asarray(pe_samples)
    if grid is not None:
        L, gx, gy = grid
        ax1.contourf(gx, gy, np.asarray(L), levels=10, cmap="Greys", alpha=0.6)
    if pe_samples is not None:
        ax1.plot(pe_samples[:, 0], pe_samples[:, 1], ".r", markersize=0.8)
        if len(pe_samples) > 50:
            _kde_contours(ax1, pe_samples, "red")
    if ref_samples is not None:
        ref_samples = np.asarray(ref_samples)
        ax1.plot(ref_samples[:, 0], ref_samples[:, 1], ".b", markersize=0.8)
        if len(ref_samples) > 50:
            _kde_contours(ax1, ref_samples, "blue")
        if pe_samples is not None:
            beta = beta_overlap(pe_samples, ref_samples)
            ax1.legend([f"Overlap: {beta:.3f}"], fontsize=8)

    if truth is not None:
        ax1.axvline(truth[0], color="k", alpha=0.5)
        ax1.axhline(truth[1], color="k", alpha=0.5)
        if pe_std is not None:
            ax1.plot([truth[0] - pe_std[0], truth[0] + pe_std[0]], [truth[1]] * 2, "-c")
            ax1.plot([truth[0]] * 2, [truth[1] - pe_std[1], truth[1] + pe_std[1]], "-c")

    ax2 = fig.add_subplot(221)
    ax3 = fig.add_subplot(224)
    if pe_samples is not None:
        ax2.hist(pe_samples[:, 0], bins=100, alpha=0.5, density=True)
        ax3.hist(pe_samples[:, 1], bins=100, orientation="horizontal", alpha=0.5, density=True)
    if ref_samples is not None:
        ax2.hist(ref_samples[:, 0], bins=100, alpha=0.5, density=True)
        ax3.hist(ref_samples[:, 1], bins=100, orientation="horizontal", alpha=0.5, density=True)
    ax2.set_xticks([])
    ax3.set_yticks([])
    ax1.set_xlabel("mc")
    ax1.set_ylabel("mass ratio")
    _save(fig, out_path, fname or f"pe_samples{index:05d}.png", "pe_samples.png")
    return beta


def plot_waveform_est(signal, measured, generated, out_path, index=0, zoom=None,
                      n_viewed=25, fname=None):
    """Waveform-estimate dashboard: measured+true, percentile bands
    (5/25/75/90) of generated samples, residual bundle
    (ref: plot_waveform_est, :875-957)."""
    signal = np.asarray(signal).ravel()
    measured = np.asarray(measured).ravel()
    generated = np.asarray(generated)
    gen = generated[:n_viewed].reshape(min(n_viewed, len(generated)), -1)

    fig, (ax1, ax2, ax3) = plt.subplots(3, 1, sharey=True, figsize=(8, 7))
    ax1.plot(signal, color="cyan", alpha=0.5, linewidth=0.5)
    ax1.plot(measured, color="green", alpha=0.35, linewidth=0.5)

    perc = np.percentile(generated, [5, 25, 75, 90], axis=0)
    x = np.arange(perc.shape[1])
    ax2.plot(signal, color="cyan", linewidth=0.5, alpha=0.5)
    ax2.fill_between(x, perc[3], perc[0], lw=0, facecolor="#d5d8dc")
    ax2.fill_between(x, perc[2], perc[1], lw=0, facecolor="#808b96")
    ax2.set_ylabel("Amplitude (counts)")

    residuals = measured[None, :] - gen
    ax3.plot(residuals[0], color="black", linewidth=0.5)
    ax3.plot(residuals.T, color="red", alpha=0.25, linewidth=0.5)
    ax3.set_xlabel("Time")

    if zoom is not None:
        for ax in (ax1, ax2, ax3):
            ax.set_xlim(zoom)
    tag = "waveform_zoomed" if zoom is not None else "waveform"
    _save(fig, out_path, fname or f"{tag}_results{index:05d}.png", f"most_recent_{tag}.png")


def plot_beta_history(beta_hist, steps, out_path, fname="beta_hist.png"):
    """β-overlap score vs training step (ref: :1356-1359)."""
    fig, ax = plt.subplots()
    ax.plot(steps, beta_hist)
    ax.set_xlabel("iteration")
    ax.set_ylabel("β overlap")
    _save(fig, out_path, fname, fname)
