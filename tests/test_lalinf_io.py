"""lalinference-product interop tests against synthetic files in the exact
formats the reference consumes (ref: gw_template_maker.py:753-767,
get_lalinf_pars.py:39-91)."""

import numpy as np
import pytest

from gennet_tpu.data import lalinf_io
from gennet_tpu.physics.constants import STRAIN_SCALE


@pytest.fixture
def lalinf_dir(tmp_path):
    """Fabricate a lalinference engine output directory: FD data, data+inj,
    PSD ASCII, and a posterior HDF5."""
    fs, T_safe = 1024, 4
    Nf = fs * T_safe // 2 + 1
    rng = np.random.default_rng(0)
    f = np.arange(Nf) / T_safe

    psd = np.full(Nf, 1e-42)
    psd[f < 20] = 0.0

    # colored noise FD (continuous units) + an injected "signal"
    amp = np.sqrt(T_safe * psd / 4)
    noise_fd = amp * (rng.normal(size=Nf) + 1j * rng.normal(size=Nf))
    sig_fd = np.zeros(Nf, complex)
    band = (f > 40) & (f < 300)
    sig_fd[band] = 2e-22 * np.exp(-2j * np.pi * f[band] * 2.0)
    noise_fd[3] = np.nan + 1j * np.nan  # NaN scrubbing path (ref: :762-763)

    base = "lalinferencenest-0-H1-1126259462.0-0.hdf5H1"

    def write_fd(name, z):
        np.savetxt(tmp_path / name, np.stack([f, z.real, z.imag], -1))

    write_fd(f"{base}-freqData.dat", noise_fd)
    write_fd(f"{base}-freqDataWithInjection.dat", noise_fd + sig_fd)
    np.savetxt(tmp_path / f"{base}-PSD.dat", np.stack([f, psd], -1))

    # posterior HDF5 (plain h5py layout)
    import h5py

    mc = rng.normal(30.0, 1.5, 500)
    q = rng.uniform(0.6, 0.95, 500)
    with h5py.File(tmp_path / "posterior_samples.hdf5", "w") as hf:
        g = hf.create_group("lalinference/nest")
        g.create_dataset("mc", data=mc)
        g.create_dataset("q", data=q)
    return str(tmp_path), mc, q


def test_load_freq_data_scrubs_nans(lalinf_dir):
    d, _, _ = lalinf_dir
    z = lalinf_io.load_freq_data(
        f"{d}/lalinferencenest-0-H1-1126259462.0-0.hdf5H1-freqData.dat"
    )
    assert np.isfinite(z).all()
    assert z[3] == 0.0


def test_load_event_products(lalinf_dir):
    d, mc, q = lalinf_dir
    out = lalinf_io.load_event_products(d)
    assert out["measured_whitened"].shape == (1024,)
    assert out["signal_whitened"].shape == (1024,)
    # whitened measured data normalized to unit std over the safe window,
    # so central-1s std is O(1)
    assert 0.5 < np.std(out["measured_whitened"]) < 2.0
    assert np.isfinite(out["norm_constant"])
    # posterior found and converted
    post = out["posterior_mc_q"]
    np.testing.assert_allclose(np.sort(post[:, 0]), np.sort(mc))
    m1m2 = out["posterior_m1_m2"]
    assert (m1m2[:, 0] >= m1m2[:, 1]).all()


def test_posterior_mc_q_inverts_q_above_one(tmp_path):
    import h5py

    with h5py.File(tmp_path / "p.h5", "w") as hf:
        hf.create_dataset("mc", data=np.asarray([30.0]))
        hf.create_dataset("q", data=np.asarray([1.25]))  # m1/m2 convention
    mcq, m1m2 = lalinf_io.load_posterior_mc_q(str(tmp_path / "p.h5"))
    assert mcq[0, 1] == pytest.approx(0.8)


def test_bank_npz_roundtrip(tmp_path):
    t = np.random.default_rng(0).normal(size=(8, 64)).astype(np.float32)
    p = {"mc": np.arange(8.0), "q": np.linspace(0.5, 1, 8)}
    lalinf_io.save_bank_npz(str(tmp_path / "b.npz"), t, p)
    t2, p2 = lalinf_io.load_bank_npz(str(tmp_path / "b.npz"))
    np.testing.assert_array_equal(t, t2)
    np.testing.assert_array_equal(p["mc"], p2["mc"])


# ---- MDC sim_burst XML tooling (ref: make_hw-xml.py / make-hw-frames.py) --

def test_mdc_xml_roundtrip(tmp_path):
    from gennet_tpu.data import mdc_xml as M

    rng = __import__("numpy").random.default_rng(3)
    mdcset = M.MDCSet(["H1"])
    times = M.uniform_time(1126620016, 1136995216, 5, rng=rng)
    hrss = M.log_uniform(5e-23, 1e-20, 5, rng=rng)
    for h, t in zip(hrss, times):
        mdcset + M.sine_gaussian(q=15, frequency=150.0, hrss=float(h),
                                 time=float(t))
    mdcset + M.white_noise_burst(duration=0.1, bandwidth=10, frequency=1000,
                                 hrss=1e-23, time=1126630000, seed=3)
    path = str(tmp_path / "set.xml.gz")
    mdcset.save_xml(path)
    back = M.MDCSet.load_xml(path)
    assert len(back.injections) == 6
    for a, b in zip(mdcset.injections, back.injections):
        assert a.waveform == b.waveform
        assert abs(a.time - b.time) < 1e-6
        assert abs(a.hrss - b.hrss) / a.hrss < 1e-12
        assert a.seed == b.seed


def test_mdc_render_hrss_and_files(tmp_path):
    import numpy as np
    from gennet_tpu.data import mdc_xml as M

    fs = 4096
    sg = M.sine_gaussian(q=15, frequency=150.0, hrss=3e-22, time=0.0)
    h = M.render_injection(sg, fs=fs)
    assert abs(np.sqrt(np.sum(h**2) / fs) - 3e-22) / 3e-22 < 1e-6
    # q=15 sine-Gaussian: spectral peak at the centre frequency
    f = np.fft.rfftfreq(h.size, 1.0 / fs)
    assert abs(f[np.argmax(np.abs(np.fft.rfft(h)))] - 150.0) < 5.0

    wnb = M.white_noise_burst(duration=0.1, bandwidth=10, frequency=1000,
                              hrss=1e-23, time=0.0, seed=3)
    hw = M.render_injection(wnb, fs=fs)
    assert abs(np.sqrt(np.sum(hw**2) / fs) - 1e-23) / 1e-23 < 1e-6
    P = np.abs(np.fft.rfft(hw))**2
    f = np.fft.rfftfreq(hw.size, 1.0 / fs)
    in_band = P[(f > 990) & (f < 1010)].sum()
    assert in_band / P.sum() > 0.9  # band-limited (envelope leaks a little)

    mdcset = M.MDCSet(["H1", "L1"], [sg, wnb])
    paths = M.render_injection_files(mdcset, str(tmp_path / "inj"), fs=fs)
    assert len(paths) == 4
    t, hh = np.loadtxt(paths[0]).T
    np.testing.assert_allclose(hh, h)


# ---- full-fidelity synthetic products (VERDICT r3 #8) ---------------------

@pytest.mark.slow
def test_synthetic_products_roundtrip(tmp_path):
    """write_synthetic_products ↔ load_event_products is an exact inverse:
    the loaded whitened event equals the synthetic path's event template
    (corr ≈ 1) and the norm constant matches the writer's."""
    import jax

    from gennet_tpu.data import synth_products as sp
    from gennet_tpu.data import template_bank as tb
    from gennet_tpu.physics import psd as psd_mod

    d = str(tmp_path / "prod")
    out = sp.write_synthetic_products(d, seed=0, n_posterior=200,
                                      grid_grain=12)
    prod = lalinf_io.load_event_products(d)
    assert prod["norm_constant"] == pytest.approx(out["norm_constant"],
                                                  rel=1e-6)
    np.testing.assert_allclose(prod["measured_whitened"],
                               out["measured_whitened"], atol=2e-4)
    cfg = tb.BankConfig()
    psd = psd_mod.analytic_advligo_psd(cfg.fs, cfg.T_obs * cfg.safe)
    tmpl = np.asarray(tb.make_event_template(psd, cfg)) * out["norm_constant"]
    sig = prod["signal_whitened"]
    corr = np.dot(tmpl, sig) / np.sqrt(np.dot(tmpl, tmpl) * np.dot(sig, sig))
    assert corr > 0.9999
    # posterior HDF5 found, converted, concentrated near the truth
    post = prod["posterior_mc_q"]
    assert post.shape == (200, 2)
    mc_t, q_t = out["truth"]
    assert abs(np.median(post[:, 0]) - mc_t) < 2.0
    assert abs(np.median(post[:, 1]) - q_t) < 0.25
    # width regression (ADVICE r4): the written posterior must have the
    # width of the exact grid at the NORMALIZED noise std (norm·σ_white,
    # the same event-norm convention as run_bbh's effective_n_sig); the
    # old writer passed whitened units and was ~1/norm (~1.5×) too wide.
    # Needs a σ-resolving grid: at the broad default box, cell width
    # exceeds the posterior σ and the sample width is pure cell jitter.
    from gennet_tpu.eval import grid_posterior as gp

    d2 = str(tmp_path / "prod_narrow")
    mc_t2, q_t2 = out["truth"]
    mcr = (mc_t2 - 1.5, mc_t2 + 1.5)
    qr = (max(q_t2 - 0.15, 0.5), min(q_t2 + 0.15, 1.0))
    out2 = sp.write_synthetic_products(d2, seed=0, n_posterior=400,
                                       grid_grain=32, mc_range=mcr,
                                       q_range=qr)
    L, gx, gy = gp.bbh_grid_posterior(
        out2["measured_whitened"], np.asarray(psd), cfg,
        norm_constant=out2["norm_constant"],
        noise_sigma=out2["norm_constant"], grain=32,
        mc_range=mcr, q_range=qr)
    _, _, smc, sq = gp.grid_moments(np.asarray(L), np.asarray(gx),
                                    np.asarray(gy))
    post2 = out2["posterior_mc_q"]
    assert 0.7 < post2[:, 0].std() / smc < 1.3
    assert 0.7 < post2[:, 1].std() / sq < 1.3
    # comparative pin (the measured buggy-vs-correct width gap is only
    # ~1.16× at this geometry, inside the band above): the written cloud
    # must match the correct-σ grid's width BETTER than the buggy
    # whitened-units grid's
    Lb, _, _ = gp.bbh_grid_posterior(
        out2["measured_whitened"], np.asarray(psd), cfg,
        norm_constant=out2["norm_constant"], noise_sigma=1.0, grain=32,
        mc_range=mcr, q_range=qr)
    _, _, smc_b, _ = gp.grid_moments(np.asarray(Lb), np.asarray(gx),
                                     np.asarray(gy))
    assert abs(np.log(post2[:, 0].std() / smc)) < \
        abs(np.log(post2[:, 0].std() / smc_b))


@pytest.mark.slow
@pytest.mark.slowest
def test_train_bbh_lalinf_dir_end_to_end(tmp_path):
    """The real-data branch of run_bbh, end-to-end on a synthetic product
    directory in the exact reference layout (ref: gw_template_maker.py
    :743-795): loader → norm constant → bank normalized by it → CNN/GAN →
    β vs the mounted posterior (never None)."""
    from gennet_tpu.cli.workloads import BBHConfig, run_bbh
    from gennet_tpu.data import synth_products as sp

    d = str(tmp_path / "prod")
    sp.write_synthetic_products(d, seed=0, n_posterior=300, grid_grain=12)
    cfg = BBHConfig(
        lalinf_dir=d, training_num=24, pe_iters=40, gan_iters=2,
        cadence=1, eval_cadence=1, pe_cadence=50, n_posterior=8,
        grid_grain=11, ckpt_every=1000, plots=False,
        out_dir=str(tmp_path / "run"),
    )
    out = run_bbh(cfg)
    # β scored against the mounted ("lalinference") cloud
    assert out["beta"] is not None and 0.0 <= out["beta"] <= 1.0
    assert out["cnn_sanity_beta"] is not None
