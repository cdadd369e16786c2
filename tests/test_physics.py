"""Physics-core golden-value and consistency tests.

The reference has no test suite; these encode its validation idioms
(SURVEY.md §4) as real pytest checks, with golden values recomputed from the
reference's formulas in independent numpy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennet_tpu.physics import (
    burst,
    constants,
    detector,
    noise,
    priors,
    psd,
    waveform,
    whiten,
    windows,
)
from gennet_tpu.ops import dft


# ---------------------------------------------------------------- windows
def _ref_tukey(M, alpha=0.5):
    # independent recomputation of the reference's formula
    # (ref: gw_template_maker.py:87-113)
    n = np.arange(0, M)
    width = int(np.floor(alpha * (M - 1) / 2.0))
    n1, n2, n3 = n[: width + 1], n[width + 1 : M - width - 1], n[M - width - 1 :]
    w1 = 0.5 * (1 + np.cos(np.pi * (-1 + 2.0 * n1 / alpha / (M - 1))))
    w2 = np.ones(n2.shape)
    w3 = 0.5 * (1 + np.cos(np.pi * (-2.0 / alpha + 1 + 2.0 * n3 / alpha / (M - 1))))
    return np.concatenate((w1, w2, w3))[:M]


@pytest.mark.parametrize("M,alpha", [(4096, 1 / 8), (512, 0.5), (1023, 0.3)])
def test_tukey_matches_reference(M, alpha):
    w = np.asarray(windows.tukey(M, alpha))
    np.testing.assert_allclose(w, _ref_tukey(M, alpha), atol=2e-7)


def test_centered_tukey_window():
    # ref: gw_template_maker.py:536-538 — zero outside a centred (16/15)N/2
    # tukey; flat at the centre
    N = 4096
    w = np.asarray(windows.centered_tukey_window(N, safe=2))
    assert w[N // 2] == pytest.approx(1.0)
    assert w[0] == 0.0 and w[-1] == 0.0
    tempn = int((16 / 15) * N / 2)
    start = int((N - tempn) / 2)
    assert np.all(w[:start] == 0)


# ---------------------------------------------------------------- whiten
def test_whiten_fd_matches_reference_formula():
    rng = np.random.default_rng(0)
    fs, T = 1024, 2
    Nf = fs * T // 2 + 1
    data = rng.normal(size=Nf) + 1j * rng.normal(size=Nf)
    p = np.abs(rng.normal(size=Nf)) + 0.1
    p[5] = 0.0  # undefined bin
    out = np.asarray(whiten.whiten_fd(jnp.asarray(data), jnp.asarray(p), fs))
    ref = data * np.sqrt(2.0 * np.where(p > 0, 1 / np.where(p > 0, p, 1), 0) / fs)
    ref[0] = 0.0
    np.testing.assert_allclose(out, ref, rtol=2e-6)
    assert out[5] == 0.0


def test_whitened_colored_noise_is_unit_variance():
    # the GAN's core assumption: whitened noise has sigma=1
    # (ref: gw_template_maker.py:779-784)
    fs, T = 1024, 4
    p = psd.analytic_advligo_psd(fs, T)
    key = jax.random.PRNGKey(1)
    x = noise.colored_noise(key, p, T, fs, batch_shape=(64,))
    w = whiten.whiten_td(x, p, fs)
    # interior samples (excluding window taper)
    core = np.asarray(w[:, fs : 3 * fs])
    assert abs(core.std() - 1.0) < 0.05


def test_whitening_gain_amp_phase_equivalence():
    # whiten_fd(h) == (amp*gain) e^{-i phase} for h = amp e^{-i phase}
    fs, T = 1024, 2
    Nf = fs * T // 2 + 1
    rng = np.random.default_rng(3)
    amp = jnp.asarray(np.abs(rng.normal(size=Nf)))
    phase = jnp.asarray(rng.uniform(0, 6, size=Nf))
    p = jnp.asarray(np.abs(rng.normal(size=Nf)) + 0.1)
    h = amp * jnp.exp(-1j * phase)
    ref = np.asarray(whiten.whiten_fd(h, p, fs))
    gain = whiten.whitening_gain(p, fs)
    out = np.asarray((amp * gain) * jnp.exp(-1j * phase))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------- noise
def test_colored_noise_psd_recovery():
    # periodogram of generated noise should average to the target PSD
    # (ref formula: gen_noise, gw_template_maker.py:179-193)
    fs, T = 256, 4
    Nf = fs * T // 2 + 1
    p = np.ones(Nf)
    p[:8] = 0.0
    x = noise.colored_noise(jax.random.PRNGKey(0), jnp.asarray(p), T, fs, batch_shape=(256,))
    xf = np.fft.rfft(np.asarray(x), axis=-1)
    est = 2 * np.mean(np.abs(xf) ** 2, axis=0) / (fs * fs * T)
    np.testing.assert_allclose(est[8:-1], p[8:-1], rtol=0.25)
    assert np.all(est[1:7] < 1e-10)


# ---------------------------------------------------------------- priors
@pytest.mark.parametrize("mdist", ["astro", "hunt_constrain", "gh", "metric"])
def test_mass_prior_constraints(mdist):
    out = priors.sample_masses(jax.random.PRNGKey(42), 4096, mdist=mdist)
    m1, m2, mc = np.asarray(out["m1"]), np.asarray(out["m2"]), np.asarray(out["mc"])
    assert np.asarray(out["valid"]).all()
    assert (m1 >= m2 - 1e-6).all()
    if mdist in ("astro", "hunt_constrain", "metric"):
        assert (m1 + m2 < 100.0 + 1e-3).all()
        assert (m2 > 5.0 - 1e-6).all()
    if mdist == "hunt_constrain":
        # ref: gw_template_maker.py:336
        assert (m2 / m1 >= 0.5 - 1e-6).all()
        assert (mc >= 20.0 - 1e-4).all() and (mc <= 35.0 + 1e-4).all()
    if mdist == "gh":
        assert (m1 < 75.0).all() and (m2 >= 5.0).all()


def test_mc_q_roundtrip():
    # closed-form replacement for the reference's sympy solve
    # (ref: get_lalinf_pars.py:52-67)
    m1, m2 = 36.0, 29.0
    mc, _ = priors.chirp_mass_eta(m1, m2)
    r1, r2 = priors.mc_q_to_m1m2(mc, m2 / m1)
    assert float(r1) == pytest.approx(m1, rel=1e-6)
    assert float(r2) == pytest.approx(m2, rel=1e-6)


# ---------------------------------------------------------------- burst
def test_sine_gaussian_matches_reference_formula():
    # ref: burstMahoGANy.py:90-93
    t0, tau = 0.4, 1 / 30
    h = np.asarray(burst.sine_gaussian(t0, tau))
    t = np.arange(512) / 512
    ref = np.sin(2 * np.pi * 100 * (t - t0) + 2 * np.pi) * np.exp(-((t - t0) ** 2) / tau**2)
    np.testing.assert_allclose(h, ref, atol=1e-5)


def test_burst_bank_batch():
    bank, pars = burst.make_burst_bank(jax.random.PRNGKey(0), 128)
    assert bank.shape == (128, 512) and pars.shape == (128, 2)
    p = np.asarray(pars)
    assert (p[:, 0] >= 0.25).all() and (p[:, 0] <= 0.75).all()
    assert (p[:, 1] >= 1 / 60).all() and (p[:, 1] <= 1 / 15).all()


# ---------------------------------------------------------------- detector
def test_antenna_response_bounds_and_orthogonality():
    key = np.random.default_rng(0)
    ra = key.uniform(0, 2 * np.pi, 100)
    dec = np.arcsin(key.uniform(-1, 1, 100))
    psi_ = key.uniform(0, 2 * np.pi, 100)
    fp, fc = detector.antenna_response(constants.GW150914_EVENT_TIME, ra, dec, psi_, "H1")
    fp, fc = np.asarray(fp), np.asarray(fc)
    assert (fp**2 + fc**2 <= 1.0 + 1e-9).all()
    # psi rotation by pi/4 swaps F+ <-> Fx: e+(ψ+π/4)=e×(ψ), e×(ψ+π/4)=−e+(ψ)
    fp2, fc2 = detector.antenna_response(
        constants.GW150914_EVENT_TIME, ra, dec, psi_ + np.pi / 4, "H1"
    )
    np.testing.assert_allclose(np.asarray(fp2), np.asarray(fc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fc2), np.asarray(-fp), atol=1e-5)
    # and by pi/2 flips both signs
    fp3, fc3 = detector.antenna_response(
        constants.GW150914_EVENT_TIME, ra, dec, psi_ + np.pi / 2, "H1"
    )
    np.testing.assert_allclose(np.asarray(fp3), np.asarray(-fp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fc3), np.asarray(-fc), atol=1e-5)


def test_time_delay_bounded_by_earth_radius():
    d = detector.time_delay_from_earth_center(
        constants.GW150914_EVENT_TIME, 2.2153, -1.2365, "H1"
    )
    assert abs(float(d)) < 0.0215  # R_earth/c


def test_hl_baseline_delay():
    # H1-L1 light travel time is ~10 ms; difference of geocentre delays must
    # never exceed it
    rng = np.random.default_rng(1)
    ra = rng.uniform(0, 2 * np.pi, 200)
    dec = np.arcsin(rng.uniform(-1, 1, 200))
    dh = np.asarray(detector.time_delay_from_earth_center(1126259462.0, ra, dec, "H1"))
    dl = np.asarray(detector.time_delay_from_earth_center(1126259462.0, ra, dec, "L1"))
    assert np.abs(dh - dl).max() <= 0.010013
    # and some skies should get close to the full baseline
    assert np.abs(dh - dl).max() > 0.008


def test_fd_time_shift_phase_equals_complex_shift():
    fs, T = 256, 2
    Nf = fs * T // 2 + 1
    rng = np.random.default_rng(0)
    x = rng.normal(size=fs * T)
    dt = 0.125
    xf = np.fft.rfft(x)
    shifted = np.fft.irfft(xf * np.exp(-2j * np.pi * np.arange(Nf) / T * dt))
    amp = jnp.asarray(np.abs(xf))
    phase = jnp.asarray(-np.angle(xf))
    phase2 = detector.fd_time_shift_phase(phase, dt, T)
    out = dft.irdft(amp * jnp.cos(-phase2), amp * jnp.sin(-phase2), fs * T)
    np.testing.assert_allclose(np.asarray(out), shifted, atol=1e-4)


# ---------------------------------------------------------------- DFT ops
def test_irdft_matches_numpy():
    rng = np.random.default_rng(0)
    N = 512
    spec = rng.normal(size=N // 2 + 1) + 1j * rng.normal(size=N // 2 + 1)
    out = dft.irdft(jnp.asarray(spec.real, jnp.float32), jnp.asarray(spec.imag, jnp.float32), N)
    np.testing.assert_allclose(np.asarray(out), np.fft.irfft(spec, N), atol=1e-5)


def test_rdft_matches_numpy():
    rng = np.random.default_rng(1)
    N = 512
    x = rng.normal(size=(3, N))
    re, im = dft.rdft(jnp.asarray(x, jnp.float32))
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3)


def test_rdft_irdft_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 1024)), jnp.float32)
    re, im = dft.rdft(x)
    back = dft.irdft(re, im, 1024)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


# ---------------------------------------------------------------- PSD
def test_analytic_psd_positive_in_band():
    p = np.asarray(psd.analytic_advligo_psd(1024, 4, "AdvDesign", "H1"))
    f = psd.rfft_freqs(1024, 4)
    band = (f >= 10) & (f <= 512)
    assert (p[band] > 0).all()
    assert (p[f < 10] == 0).all()
    # minimum of the AdV curve sits around 250-350 Hz
    fmin = f[band][np.argmin(p[band])]
    assert 150 < fmin < 400


_PUBLISHED_RANGES = {  # P1200087 / observing-scenarios AdV BNS ranges [Mpc]
    "AdvDesign": 125.0, "AdvEarlyLow": 20.0, "AdvEarlyHigh": 65.0,
    "AdvMidLow": 65.0, "AdvMidHigh": 85.0, "AdvLateLow": 65.0,
    "AdvLateHigh": 115.0,
}


def test_scenario_psds_match_published_bns_ranges():
    """Every P1200087 scenario curve is quantitatively anchored: its computed
    sky-averaged BNS range equals the published scenario value (the range is
    THE figure of merit P1200087 defines the scenarios by)."""
    from gennet_tpu.physics.constants import STRAIN_SCALE

    fs, T = 4096, 8  # fine grid so the discretized integral converges
    f = psd.rfft_freqs(fs, T)
    for op, target in _PUBLISHED_RANGES.items():
        p = np.asarray(psd.analytic_advligo_psd(fs, T, op), np.float64)
        r = psd.bns_range_mpc(f, p / STRAIN_SCALE**2)
        assert abs(r - target) / target < 0.03, f"{op}: {r} vs {target}"


def test_scenario_psds_have_distinct_shapes():
    """Early/mid/late curves differ in SHAPE, not just amplitude: the
    commissioning-era low-frequency wall makes the early-curve penalty at
    25 Hz much larger than its broadband penalty at 150 Hz (the VERDICT
    round-1 finding was a flat scale — same ratio everywhere)."""
    fs, T = 1024, 4
    f = psd.rfft_freqs(fs, T)
    design = np.asarray(psd.analytic_advligo_psd(fs, T, "AdvDesign"), np.float64)
    early = np.asarray(psd.analytic_advligo_psd(fs, T, "AdvEarlyLow"), np.float64)
    i25 = np.argmin(np.abs(f - 25.0))
    i150 = np.argmin(np.abs(f - 150.0))
    ratio_low = early[i25] / design[i25]
    ratio_mid = early[i150] / design[i150]
    assert ratio_low > 3.0 * ratio_mid  # wall, not flat scaling
    # in the wall region (25 Hz) commissioning eras are strictly ordered:
    # early > mid > late > design (at matched mid-band range the later-era
    # curves trade low-frequency reach against broadband depth)
    lows = [np.asarray(psd.analytic_advligo_psd(fs, T, op), np.float64)[i25]
            for op in ("AdvEarlyLow", "AdvMidLow", "AdvLateLow", "AdvDesign")]
    assert all(a > b for a, b in zip(lows, lows[1:])), lows


def test_aligo_zdhp_range_sane():
    """The aLIGOZDHP fit's computed BNS range lands in the published aLIGO
    design ballpark (~190-200 Mpc; analytic-fit tolerance allowed)."""
    from gennet_tpu.physics.constants import STRAIN_SCALE

    fs, T = 4096, 8
    f = psd.rfft_freqs(fs, T)
    p = np.asarray(psd.analytic_advligo_psd(fs, T, "aLIGOZDHP"), np.float64)
    r = psd.bns_range_mpc(f, p / STRAIN_SCALE**2)
    assert 175.0 < r < 235.0, r


# ---------------------------------------------------------------- waveform
def test_final_state_known_values():
    # equal-mass nonspinning: a_f ~ 0.686, E_rad ~ 4.8% (NR-calibrated fits)
    assert float(waveform.final_spin(0.25)) == pytest.approx(0.6864, abs=2e-3)
    assert float(waveform.radiated_energy(0.25)) == pytest.approx(0.0484, abs=1e-3)


def test_ringdown_frequency_gw150914_scale():
    # GW150914: fRD ~ 250 Hz for M=65 Msun
    eta = 36.0 * 29.0 / 65.0**2
    frd, fdamp = waveform.ringdown_freqs(eta)
    m_sec = 65.0 * constants.MTSUN_SI
    assert 230 < float(frd) / m_sec < 290
    assert 0 < float(fdamp) < float(frd)


def test_phenomd_peak_strain_physical_scale():
    # GW150914 at 410 Mpc: TD peak strain ~1e-21 (framework carries scaled
    # strain = strain × STRAIN_SCALE)
    fs, T = 1024, 4
    f = jnp.asarray(np.arange(T * fs // 2 + 1) / T)
    hp, _ = waveform.imrphenomd_htilde(f, 36.0, 29.0, inclination=2.5)
    ht = np.fft.irfft(np.asarray(hp), T * fs) * fs / constants.STRAIN_SCALE
    peak = np.abs(ht).max()
    assert 5e-22 < peak < 5e-21
    assert not np.isnan(ht).any()


def test_phenomd_taylorf2_low_freq_consistency():
    # PhenomD inspiral == TaylorF2 + (tc, phic) freedom + small sigma terms:
    # phase difference must be nearly linear in f at low frequency
    fs, T = 1024, 4
    f = jnp.asarray(np.arange(T * fs // 2 + 1) / T)
    hp_d, _ = waveform.imrphenomd_htilde(f, 36.0, 29.0)
    hp_t, _ = waveform.taylorf2_htilde(f, 36.0, 29.0)
    i0, i1 = int(40 * T), int(55 * T)
    dphi = np.unwrap(np.angle(np.asarray(hp_d[i0:i1]))) - np.unwrap(
        np.angle(np.asarray(hp_t[i0:i1]))
    )
    curvature = np.abs(np.diff(dphi, 2)).max()
    assert curvature < 5e-3
    ratio = np.abs(np.asarray(hp_d[i0:i1])) / np.abs(np.asarray(hp_t[i0:i1]))
    assert np.all((ratio > 0.95) & (ratio < 1.05))


def test_phenomd_amplitude_phase_continuity():
    # C(0) continuity across the stitched regions on a dense grid
    m1, m2 = 36.0, 29.0
    m_sec = (m1 + m2) * constants.MTSUN_SI
    f = jnp.asarray(np.linspace(20, 500, 200000))
    amp, phase = waveform.imrphenomd_ampphase(f, m1, m2, f_low=20.0)
    amp, phase = np.asarray(amp), np.asarray(phase)
    # relative jumps between adjacent samples stay small through boundaries
    rel = np.abs(np.diff(amp)) / (np.abs(amp[:-1]) + 1e-30)
    assert rel.max() < 0.01
    assert np.abs(np.diff(phase)).max() < 0.2


def test_phenomd_analytic_derivatives(x64):
    # the C(1) stitching constants rely on analytic derivatives (float32
    # finite differences cancel catastrophically) — check vs x64 central FD
    eta = 36.0 * 29.0 / 65.0**2
    c = waveform._eval_fits(jnp.float64(eta), jnp.float64(0.0))
    frd, fdamp = waveform.ringdown_freqs(eta)
    eps = 1e-9

    def fd(fn, f0):
        return (float(fn(f0 + eps)) - float(fn(f0 - eps))) / (2 * eps)

    f0 = jnp.float64(0.014)
    assert fd(lambda f: waveform._amp_inspiral(f, eta, c, 0.0, 0.0), f0) == pytest.approx(
        float(waveform._damp_inspiral(f0, eta, c, 0.0, 0.0)), rel=1e-5
    )
    assert fd(lambda f: waveform._phase_inspiral(f, eta, c, 0.0, 0.0), f0) == pytest.approx(
        float(waveform._dphase_inspiral(f0, eta, c, 0.0, 0.0)), rel=1e-5
    )
    f2 = jnp.float64(0.6) * frd
    assert fd(lambda f: waveform._phase_mr(f, eta, c, frd, fdamp), f2) == pytest.approx(
        float(waveform._dphase_mr(f2, eta, c, frd, fdamp)), rel=1e-5
    )
    assert fd(lambda f: waveform._amp_mr(f, c, frd, fdamp), f2) == pytest.approx(
        float(waveform._damp_mr(f2, c, frd, fdamp)), rel=1e-4
    )
    assert fd(lambda f: waveform._phase_intermediate(f, eta, c), f2) == pytest.approx(
        float(waveform._dphase_intermediate(f2, eta, c)), rel=1e-5
    )


def test_phenomd_vmap_bank():
    f = jnp.asarray(np.arange(2049) / 4.0)
    m1 = jnp.asarray([36.0, 30.0, 50.0])
    m2 = jnp.asarray([29.0, 25.0, 20.0])
    amp, phase = jax.vmap(lambda a, b: waveform.imrphenomd_ampphase(f, a, b))(m1, m2)
    assert amp.shape == (3, 2049)
    assert not np.isnan(np.asarray(amp)).any()
    assert not np.isnan(np.asarray(phase)).any()


def test_snr_consistency_fd_td():
    # optimal SNR from the FD amplitude equals the whitened-domain norm
    from gennet_tpu.physics import snr
    from gennet_tpu.data import template_bank as tb
    from gennet_tpu.physics import psd as psd_mod
    from gennet_tpu.physics import waveform as wf
    from gennet_tpu.physics import whiten as wh

    cfg = tb.BankConfig()
    p = psd_mod.analytic_advligo_psd(cfg.fs, cfg.T_obs * cfg.safe)
    f = jnp.asarray(cfg.freqs())
    amp, _ = wf.imrphenomd_ampphase(f, 36.0, 29.0, f_high=cfg.fs / 2)
    K, _, _, _, _ = tb._antenna_projection(cfg)  # detector projection scale
    rho_fd = float(snr.optimal_snr_fd(amp, p, cfg.T_obs * cfg.safe)) * K
    # TD: whitened event template norm (window/crop trims a little energy)
    ev = tb.make_event_template(p, cfg)
    rho_td = float(snr.whitened_snr(ev))
    assert 20 < rho_fd < 150
    assert abs(rho_td - rho_fd) / rho_fd < 0.15
