"""Template-bank pipeline tests (CPU mesh; semantics vs the reference's
sim_data/gen_bbh behavior, ref: gw_template_maker.py:462-740)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennet_tpu.data import template_bank as tb
from gennet_tpu.physics import psd as psd_mod


@pytest.fixture(scope="module")
def cfg():
    return tb.BankConfig()


@pytest.fixture(scope="module")
def psd(cfg):
    return psd_mod.analytic_advligo_psd(cfg.fs, cfg.T_obs * cfg.safe)


def test_beta_index_bounds(cfg):
    # convert_beta with beta=[0.45,0.55], fs=1024, T_obs=4, safe=2
    # (ref: gw_template_maker.py:133-159): newbeta=[0.4875,0.5125]
    lo, hi = cfg.beta_index_bounds()
    assert (lo, hi) == (1945, 2150)
    # degenerate beta=[0.5,0.5] pins the centre (gw_tmp path, ref: :421)
    c = tb.BankConfig(beta=(0.5, 0.5))
    lo, hi = c.beta_index_bounds()
    assert lo == hi == 2048


@pytest.mark.slow
def test_template_batch_shapes_and_peaks(cfg, psd):
    t, pars = tb.make_template_batch(jax.random.PRNGKey(0), 64, psd, cfg)
    t = np.asarray(t)
    assert t.shape == (64, cfg.fs)
    assert not np.isnan(t).any()
    # peak placed at requested index (envelope-vs-abs quantization ≤ few samp)
    pk = np.argmax(np.abs(t), axis=1)
    tgt = np.asarray(pars["idx"]) - (cfg.n_safe // 2 - cfg.fs // 2)
    assert np.abs(pk - tgt).max() <= 5
    # hunt_constrain prior bounds hold (ref: :336)
    mc = np.asarray(pars["mc"])
    assert mc.min() >= 20.0 - 1e-3 and mc.max() <= 35.0 + 1e-3
    q = np.asarray(pars["q"])
    assert q.min() >= 0.5 - 1e-6 and q.max() <= 1.0 + 1e-6


def test_template_scale_matches_unit_noise_convention(cfg, psd):
    # whitened templates live in the same units as sigma=1 whitened noise:
    # a GW150914-like template at design sensitivity has SNR tens
    ev = tb.make_event_template(psd, cfg)
    snr = float(jnp.sqrt(jnp.sum(ev**2)))
    assert 20 < snr < 150


def test_event_template_centered(cfg, psd):
    ev = np.asarray(tb.make_event_template(psd, cfg))
    assert ev.shape == (cfg.fs,)
    pk = np.argmax(np.abs(ev))
    assert abs(pk - cfg.fs // 2) <= 5


def test_make_event_normalization(cfg, psd):
    sig, meas, norm = tb.make_event(jax.random.PRNGKey(3), psd, cfg)
    assert float(jnp.std(meas)) == pytest.approx(1.0, abs=1e-3)
    assert 0.1 < float(norm) <= 1.0


def test_make_bank_appends_event_twin(cfg, psd):
    t, pars = tb.make_bank(jax.random.PRNGKey(0), 33, psd, cfg, batch=16)
    assert t.shape == (33, cfg.fs)
    # last template is the event twin (ref: sim_data, :729-739)
    assert pars["m1"][-1] == cfg.tmpl_m1 and pars["m2"][-1] == cfg.tmpl_m2
    assert pars["idx"][-1] == cfg.n_safe // 2
    ev = np.asarray(tb.make_event_template(psd, cfg))
    np.testing.assert_allclose(t[-1], ev, atol=1e-5)


def test_bank_determinism(cfg, psd):
    t1, _ = tb.make_template_batch(jax.random.PRNGKey(7), 8, psd, cfg)
    t2, _ = tb.make_template_batch(jax.random.PRNGKey(7), 8, psd, cfg)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


@pytest.mark.slow
def test_bank_sharded_over_mesh(cfg, psd):
    # multi-chip data-parallel generation on the virtual 8-device CPU mesh
    mesh = jax.make_mesh((8,), ("data",))
    t, pars = tb.make_bank_sharded(jax.random.PRNGKey(0), 64, psd, mesh, cfg)
    assert t.shape == (64, cfg.fs)
    assert len(t.sharding.device_set) == 8
    t = np.asarray(t)
    assert not np.isnan(t).any()
    # every shard produced distinct templates (keys folded per device)
    assert np.abs(t[:8] - t[8:16]).max() > 1e-3


def test_calibration_offset_shifts_peak(cfg, psd):
    c2 = tb.BankConfig(calibration_offset=-11)  # the reference's quirk value
    t0, p0 = tb.make_template_batch(jax.random.PRNGKey(1), 8, psd, cfg)
    t1, p1 = tb.make_template_batch(jax.random.PRNGKey(1), 8, psd, c2)
    pk0 = np.argmax(np.abs(np.asarray(t0)), axis=1)
    pk1 = np.argmax(np.abs(np.asarray(t1)), axis=1)
    assert np.median(pk0 - pk1) == pytest.approx(11, abs=2)


def test_noisy_bank_nnoise_semantics(cfg, psd):
    # n_noise=0 is a CLEAN bank (ref Nnoise=0, gw_template_maker.py:685-692);
    # n_noise=1 adds exactly one N(0,1) realization on the same templates
    clean, p0 = tb.make_noisy_template_batch(
        jax.random.PRNGKey(3), 4, psd, cfg, n_noise=0)
    noisy, p1 = tb.make_noisy_template_batch(
        jax.random.PRNGKey(3), 4, psd, cfg, n_noise=1)
    assert clean.shape == noisy.shape == (4, cfg.fs)
    np.testing.assert_array_equal(np.asarray(p0["mc"]), np.asarray(p1["mc"]))
    resid = np.asarray(noisy) - np.asarray(clean)
    # residual is unit-variance white noise, and clean really is noise-free
    assert 0.8 < resid.std() < 1.2
    base, _ = tb.make_template_batch(jax.random.PRNGKey(3), 4, psd, cfg)
    # same key => same mass/idx draws => clean bank equals the plain bank
    np.testing.assert_allclose(np.asarray(clean), np.asarray(base), atol=1e-6)
    # n_noise=2 stacks two realizations of the same template set
    two, p2 = tb.make_noisy_template_batch(
        jax.random.PRNGKey(3), 4, psd, cfg, n_noise=2)
    assert two.shape == (8, cfg.fs)
    np.testing.assert_array_equal(np.asarray(p2["mc"][:4]), np.asarray(p2["mc"][4:]))
