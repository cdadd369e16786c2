"""Full-fidelity synthetic lalinference product directories.

The reference's flagship consumes a lalinference engine output directory —
``*-freqData.dat`` / ``*-freqDataWithInjection.dat`` / ``*-PSD.dat`` ASCII
plus a nested-sampling posterior HDF5 (ref: gw_template_maker.py:752-795,
get_lalinf_pars.py:39-91). No real GW150914 product set is mounted in this
environment, so this module writes a synthetic set in the EXACT reference
layout: a PhenomD injection at the GW150914 template masses, colored
Gaussian noise drawn from the analytic detector PSD, physical strain units,
and a posterior HDF5 sampled from the event's exact (mc, q) likelihood
grid. `run_bbh --lalinf-dir <dir>` then exercises the real-data branch
end-to-end (loader → norm constant → whitening → CNN-sanity set → β vs the
"lalinference" cloud) with known ground truth.

Round-trip contract (tested): loading the written directory with
:func:`gennet_tpu.data.lalinf_io.load_event_products` reproduces the same
whitened event the synthetic path (`template_bank.make_event`) produces,
because the files are constructed as the exact inverse of the loader:

- the loader whitens via h̃·√(2/(psd·fs)) then irfft (ref: :243-286,774-777)
- the bank pipeline's whitened templates are irfft(A·gain·K·fs·e^{−iΨ})
  (template_bank._synthesize; ×fs = continuous-FT → rDFT convention)
- so the injection file must hold h̃(f) = (fs/STRAIN_SCALE)·K·A·e^{−iΨ'}
  in physical units, and the noise file ñ(f) = rfft(n_white)/(gain·SCALE)
  for unit-variance whitened noise n_white.
"""

import os

import numpy as np

from gennet_tpu.data import template_bank as tb
from gennet_tpu.physics.constants import STRAIN_SCALE


def event_fd_physical(cfg: tb.BankConfig = tb.BankConfig(),
                      peak_frac: float = 0.5) -> np.ndarray:
    """The GW150914-like template as a one-sided physical-units FD series
    h̃(f) over the safe window (ref gen_bbh synthesis, gw_template_maker.py
    :462-630), peak placed at ``peak_frac`` of the safe window.

    Pure numpy/float64 — this is a file writer, not a device pipeline."""
    from gennet_tpu.physics import waveform

    N = cfg.n_safe
    freqs = np.arange(cfg.nf) / (cfg.T_obs * cfg.safe)
    amp, phase = waveform.imrphenomd_ampphase(
        freqs, cfg.tmpl_m1, cfg.tmpl_m2, dist_mpc=cfg.dist_mpc,
        f_low=cfg.f_low, f_high=cfg.fs / 2)
    amp = np.asarray(amp, np.float64)
    phase = np.asarray(phase, np.float64)

    K, delta, tdelay, _, _ = tb._antenna_projection(cfg)
    phase = phase + (delta + 2.0 * cfg.phi) + 2.0 * np.pi * freqs * tdelay
    h = K * amp * np.exp(-1j * phase)

    # peak alignment, as the bank pipeline does (envelope argmax → FD phase
    # ramp; ref: :521-528,554-556) — on the WHITENED series, which is where
    # the reference locates the peak
    from gennet_tpu.physics import psd as psd_mod
    from gennet_tpu.physics import whiten

    psd = np.asarray(psd_mod.analytic_advligo_psd(cfg.fs, cfg.T_obs * cfg.safe))
    gain = np.asarray(whiten.whitening_gain(psd, cfg.fs))
    ht = np.fft.irfft(h * gain * cfg.fs, N)
    qt = np.fft.irfft(1j * h * gain * cfg.fs, N)  # quadrature (+π/2 phase)
    peak = int(np.argmax(ht * ht + qt * qt))
    target = int(peak_frac * N)
    shift = (target - peak) / cfg.fs
    return h * np.exp(-2j * np.pi * freqs * shift)


def write_synthetic_products(directory: str, seed: int = 0,
                             cfg: tb.BankConfig = tb.BankConfig(),
                             n_posterior: int = 4000,
                             grid_grain: int = 64,
                             event_time: str = "1126259462",
                             noise_sigma: float = 1.0,
                             mc_range=(20.0, 35.0), q_range=(0.5, 1.0)):
    """Write a complete synthetic lalinference product directory.

    Returns a dict with the ground truth: the whitened signal/measured
    central second (pre-norm), the (mc, q) truth point, and the posterior
    sample array written to the HDF5.
    """
    os.makedirs(directory, exist_ok=True)
    rng = np.random.default_rng(seed)
    N = cfg.n_safe
    T_safe = cfg.T_obs * cfg.safe
    freqs = np.arange(cfg.nf) / T_safe

    from gennet_tpu.physics import psd as psd_mod
    from gennet_tpu.physics import whiten

    psd_scaled = np.asarray(psd_mod.analytic_advligo_psd(cfg.fs, T_safe),
                            np.float64)
    gain = np.asarray(whiten.whitening_gain(psd_scaled, cfg.fs), np.float64)

    # ---- signal: physical-units FD injection (see module docstring) ----
    h_fd_scaled = event_fd_physical(cfg) * cfg.fs      # scaled strain units
    h_file = h_fd_scaled / STRAIN_SCALE                # physical units

    # ---- noise: unit-variance WHITENED noise, un-whitened into the file.
    # Bins the whitener zeroes (DC, psd-undefined) carry no information;
    # write zeros there (the reference's own files have NaN/0 low bins,
    # scrubbed by the loader, ref: :762-763).
    n_white = noise_sigma * rng.normal(size=N)
    n_fd_white = np.fft.rfft(n_white)
    ok = gain > 0
    n_file = np.where(ok, n_fd_white / np.where(ok, gain, 1.0), 0.0) / (
        STRAIN_SCALE)

    base = f"lalinferencenest-0-{cfg.det}-{event_time}.0-0.hdf5{cfg.det}"

    def write_fd(name, z):
        np.savetxt(os.path.join(directory, name),
                   np.stack([freqs, z.real, z.imag], -1))

    write_fd(f"{base}-freqData.dat", n_file)
    write_fd(f"{base}-freqDataWithInjection.dat", n_file + h_file)
    np.savetxt(os.path.join(directory, f"{base}-PSD.dat"),
               np.stack([freqs, psd_scaled / STRAIN_SCALE**2], -1))

    # ---- ground truth + exact-grid posterior HDF5 -----------------------
    wht_meas = np.fft.irfft((n_file + h_file) * STRAIN_SCALE * gain, N)
    wht_sig = np.fft.irfft(h_file * STRAIN_SCALE * gain, N)
    norm = 1.0 / np.std(wht_meas)
    c0 = N // 2 - cfg.fs // 2
    measured_1s = (wht_meas * norm)[c0:c0 + cfg.fs].astype(np.float32)

    from gennet_tpu.eval import grid_posterior as gp
    from gennet_tpu.physics import priors

    # the grid likelihood divides the NORMALIZED residual by noise_sigma
    # (grid_posterior.py:80), so the whitened-units noise std must be
    # scaled by the norm constant — the same event-norm convention as
    # run_bbh's effective_n_sig (ADVICE r4: the unscaled value wrote a
    # ground-truth posterior ~1/norm too wide)
    L, mc_grid, q_grid = gp.bbh_grid_posterior(
        measured_1s, psd_scaled, cfg, norm_constant=float(norm),
        noise_sigma=noise_sigma * float(norm), grain=grid_grain,
        mc_range=mc_range, q_range=q_range)
    samples = gp.sample_grid_posterior(np.asarray(L), np.asarray(mc_grid),
                                       np.asarray(q_grid), n_posterior,
                                       seed=seed)

    import h5py

    m1, m2 = priors.mc_q_to_m1m2(samples[:, 0], samples[:, 1])
    with h5py.File(os.path.join(directory, "posterior_samples.hdf5"),
                   "w") as hf:
        g = hf.create_group("lalinference/lalinference_nest")
        g.create_dataset("mc", data=samples[:, 0])
        g.create_dataset("q", data=samples[:, 1])
        g.create_dataset("m1", data=np.asarray(m1))
        g.create_dataset("m2", data=np.asarray(m2))

    mc_t, _ = priors.chirp_mass_eta(cfg.tmpl_m1, cfg.tmpl_m2)
    return {
        "signal_whitened": (wht_sig * norm)[c0:c0 + cfg.fs].astype(np.float32),
        "measured_whitened": measured_1s,
        "norm_constant": float(norm),
        "truth": (float(mc_t), cfg.tmpl_m2 / cfg.tmpl_m1),
        "posterior_mc_q": samples,
    }
