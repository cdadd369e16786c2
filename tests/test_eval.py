"""Eval-layer tests: β overlap, KDE, grid posteriors, checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennet_tpu.eval import (
    beta_overlap,
    burst_grid_posterior,
    gaussian_kde_pdf,
    grid_credible_interval,
    grid_overlap_score,
    overlap_tests,
)
from gennet_tpu.physics.burst import sine_gaussian


def test_kde_matches_scipy():
    from scipy.stats import gaussian_kde

    rng = np.random.default_rng(0)
    samples = rng.normal(size=(2, 500))
    pts = rng.normal(size=(2, 64))
    ours = gaussian_kde_pdf(samples, pts)
    ref = gaussian_kde(samples)(pts)
    np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_beta_overlap_identical_is_one():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1000, 2))
    assert beta_overlap(a, a.copy()) == pytest.approx(1.0, abs=1e-9)


def test_beta_overlap_disjoint_is_small():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(500, 2))
    b = rng.normal(size=(500, 2)) + 20.0
    assert beta_overlap(a, b) < 0.01


def test_beta_overlap_partial_between():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(800, 2))
    b = rng.normal(size=(800, 2)) + 1.0
    assert 0.1 < beta_overlap(a, b) < 0.95


def test_overlap_tests_full():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(400, 2))
    b = rng.normal(size=(400, 2))
    ks, ad, beta = overlap_tests(a, b)
    assert len(ks) == 2 and len(ad) == 2
    assert ks[0].pvalue > 1e-4  # same distribution
    assert beta > 0.9


def test_burst_grid_posterior_peaks_at_truth():
    t0, tau = 0.6, 1.0 / 30.0
    sig = sine_gaussian(t0, tau)
    L, gx, gy = burst_grid_posterior(sig, n_sig=0.25)  # noise-free measured
    L = np.asarray(L)
    j, i = np.unravel_index(np.argmax(L), L.shape)  # L axes are (tau, t0)
    assert gx[i] == pytest.approx(t0, abs=0.01)
    assert gy[j] == pytest.approx(tau, abs=0.002)
    assert L.max() == pytest.approx(1.0)


def test_grid_credible_interval_ordering():
    rng = np.random.default_rng(5)
    x = np.linspace(-3, 3, 50)
    L = np.exp(-0.5 * (x[:, None] ** 2 + x[None, :] ** 2))
    l68, l90, l99 = grid_credible_interval(L)  # default levels (0.68,0.9,0.99)
    assert l99 < l90 < l68  # wider interval → lower density threshold


def test_grid_overlap_score_sane():
    t0, tau = 0.5, 1.0 / 25.0
    sig = sine_gaussian(t0, tau)
    noisy = sig + 0.25 * jax.random.normal(jax.random.PRNGKey(0), sig.shape)
    L, gx, gy = burst_grid_posterior(noisy, 0.25)
    rng = np.random.default_rng(6)
    good = np.stack([rng.normal(t0, 0.005, 500), rng.normal(tau, 0.001, 500)], -1)
    bad = np.stack([rng.uniform(0.25, 0.75, 500), rng.uniform(1 / 60, 1 / 15, 500)], -1)
    assert grid_overlap_score(good, np.asarray(L), gx, gy) > grid_overlap_score(bad, np.asarray(L), gx, gy)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from gennet_tpu.models import BurstDiscriminator, BurstGenerator
    from gennet_tpu.train import GANConfig, init_gan
    from gennet_tpu.train.checkpoints import CheckpointManager

    cfg = GANConfig(n_pix=128, batch_size=2, pair_discriminator=False)
    G, D = BurstGenerator(n_out=128), BurstDiscriminator()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, state)
    assert mgr.latest_step() == 5

    fresh = init_gan(jax.random.PRNGKey(99), G, D, cfg)  # different init
    restored, _ = mgr.restore(fresh)
    l_orig = jax.tree_util.tree_leaves(state.g_params)[0]
    l_rest = jax.tree_util.tree_leaves(restored.g_params)[0]
    np.testing.assert_array_equal(np.asarray(l_orig), np.asarray(l_rest))
    mgr.close()


def test_posterior_snapshot_roundtrip(tmp_path):
    from gennet_tpu.train.checkpoints import load_posterior_snapshot, save_posterior_snapshot

    s = np.random.default_rng(0).normal(size=(100, 2))
    p = save_posterior_snapshot(str(tmp_path), 42, s)
    np.testing.assert_array_equal(load_posterior_snapshot(p), s)


def test_whiteness_score_accepts_white_noise():
    from gennet_tpu.eval.whiteness import whiteness_score

    rng = np.random.default_rng(0)
    white = rng.normal(size=(64, 1024))
    s = whiteness_score(white)
    assert s["overall"] > 0.9


def test_whiteness_score_rejects_structured_residual():
    from gennet_tpu.eval.whiteness import whiteness_score
    from gennet_tpu.physics.burst import sine_gaussian

    rng = np.random.default_rng(1)
    leftover = np.asarray(sine_gaussian(0.5, 1 / 25.0, N=1024))
    resid = rng.normal(size=(64, 1024)) + 3.0 * leftover[None, :]
    s = whiteness_score(resid)
    assert s["ljung_box_pass"] < 0.5


@pytest.mark.slow
def test_bbh_grid_posterior_peaks_at_truth():
    """The synthetic-event exact grid posterior (β-by-default reference cloud)
    must peak at the injected template's (mc, q)."""
    from gennet_tpu.data import template_bank as tb
    from gennet_tpu.eval import grid_posterior as gp
    from gennet_tpu.physics import priors
    from gennet_tpu.physics import psd as psd_mod

    cfg = tb.BankConfig()
    psd = psd_mod.analytic_advligo_psd(cfg.fs, cfg.T_obs * cfg.safe)
    signal, measured, norm = tb.make_event(jax.random.PRNGKey(0), psd, cfg)
    sigma = float(np.std(np.asarray(measured) - np.asarray(signal)))
    mc_t, _ = priors.chirp_mass_eta(cfg.tmpl_m1, cfg.tmpl_m2)
    q_t = cfg.tmpl_m2 / cfg.tmpl_m1

    L, gmc, gq = gp.bbh_grid_posterior(
        measured, psd, cfg, float(norm), sigma, grain=15,
        mc_range=(float(mc_t) - 3.0, float(mc_t) + 3.0), q_range=(0.55, 1.0),
    )
    L = np.asarray(L)  # (q, mc)
    assert np.isfinite(L).all() and L.max() == 1.0
    iq, imc = np.unravel_index(np.argmax(L), L.shape)
    dmc = gmc[1] - gmc[0]
    dq = gq[1] - gq[0]
    assert abs(gmc[imc] - float(mc_t)) <= 2.0 * dmc
    assert abs(gq[iq] - q_t) <= 5.0 * dq


def test_sample_grid_posterior_matches_grid():
    from gennet_tpu.eval import grid_posterior as gp

    gx = np.linspace(0.0, 1.0, 31)
    gy = np.linspace(2.0, 3.0, 31)
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    L = np.exp(-0.5 * (((X - 0.4) / 0.1) ** 2 + ((Y - 2.7) / 0.05) ** 2)).T  # (y, x)
    s = gp.sample_grid_posterior(L, gx, gy, 4000, seed=1)
    assert s.shape == (4000, 2)
    np.testing.assert_allclose(s[:, 0].mean(), 0.4, atol=0.02)
    np.testing.assert_allclose(s[:, 1].mean(), 2.7, atol=0.02)
    np.testing.assert_allclose(s[:, 0].std(), 0.1, rtol=0.2)


def test_plot_suite_writes_files(tmp_path):
    """Direct tests of every plotting entry point (signature drift would
    otherwise only surface inside a long workload)."""
    from gennet_tpu.eval import plots as P

    out = str(tmp_path)
    rng = np.random.default_rng(0)
    hist = {"d_loss": rng.random(50), "g_loss": rng.random(50),
            "d_acc": rng.random(50), "g_acc": rng.random(50)}
    P.plot_losses(hist, out)
    assert (tmp_path / "losses.png").exists()

    true_p = rng.uniform(0, 1, (100, 2))
    est_p = true_p + 0.01 * rng.standard_normal((100, 2))
    P.plot_pe_accuracy(true_p, est_p, out)
    assert (tmp_path / "pe_accuracy.png").exists()

    samples = rng.standard_normal((200, 2)) * 0.1 + [0.5, 0.5]
    ref = rng.standard_normal((200, 2)) * 0.1 + [0.52, 0.48]
    gx = np.linspace(0, 1, 21)
    gy = np.linspace(0, 1, 21)
    L = rng.random((21, 21))
    beta = P.plot_pe_samples(samples, (0.5, 0.5), out, 7, ref_samples=ref,
                             pe_std=(0.05, 0.05), grid=(L, gx, gy))
    assert (tmp_path / "pe_samples00007.png").exists()
    assert (tmp_path / "latest" / "pe_samples.png").exists()
    assert beta is not None and 0.0 <= beta <= 1.0

    sig = np.sin(np.linspace(0, 20, 256))
    meas = sig + 0.1 * rng.standard_normal(256)
    gen = sig[None, :] + 0.05 * rng.standard_normal((30, 256))
    P.plot_waveform_est(sig, meas, gen, out, 3)
    P.plot_waveform_est(sig, meas, gen, out, 3, zoom=(100, 150))
    assert (tmp_path / "waveform_results00003.png").exists()
    assert (tmp_path / "waveform_zoomed_results00003.png").exists()

    P.plot_beta_history([0.1, 0.3, 0.5], [100, 200, 300], out)
    assert (tmp_path / "beta_hist.png").exists()


def test_grid_moments_match_sampling():
    import numpy as np
    from gennet_tpu.eval import grid_posterior as gp

    # gaussian grid posterior with known moments
    gx = np.linspace(-1, 1, 201)
    gy = np.linspace(0, 2, 101)
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    L = np.exp(-0.5 * ((X - 0.2) / 0.1) ** 2 - 0.5 * ((Y - 1.3) / 0.3) ** 2)
    mx, my, sx, sy = gp.grid_moments(L.T, gx, gy)  # (y, x) convention
    assert abs(mx - 0.2) < 1e-3 and abs(my - 1.3) < 1e-2
    assert abs(sx - 0.1) < 1e-3 and abs(sy - 0.3) < 1e-2


def test_checkpoint_legacy_layout_restores_via_numpy_fallback(tmp_path):
    # A checkpoint saved with FEWER fields than today's state dataclass
    # (e.g. CNNState gained `ema` in r3) must still restore: known fields
    # merge, new fields keep their fresh values — and the fallback must
    # restore leaves as host numpy, never with the shardings recorded at
    # save time (a TPU-written checkpoint opened on a CPU host raised
    # "Device TPU v5 lite0 was not found" before this path existed).
    from flax import struct

    from gennet_tpu.train.checkpoints import CheckpointManager

    @struct.dataclass
    class Legacy:
        a: np.ndarray
        b: np.ndarray

    @struct.dataclass
    class Current:
        a: np.ndarray
        b: np.ndarray
        ema: np.ndarray  # new field the checkpoint predates

    old = Legacy(a=np.arange(4.0), b=np.ones((2, 2)))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, old)
    mgr.close()

    fresh = Current(a=np.zeros(4), b=np.zeros((2, 2)), ema=np.full(4, 7.0))
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored, _ = mgr2.restore(fresh)
    np.testing.assert_array_equal(np.asarray(restored.a), old.a)
    np.testing.assert_array_equal(np.asarray(restored.b), old.b)
    np.testing.assert_array_equal(np.asarray(restored.ema), fresh.ema)
    mgr2.close()


def test_checkpoint_legacy_grafts_ema_from_params(tmp_path):
    # When the missing field is `ema` AND the legacy state carries `params`
    # (the real CNNState case), the fallback must graft ema := params so
    # default-config eval paths (predict(use_ema=True), pe_ema_decay=0.999)
    # evaluate the restored weights, not the fresh-random EMA init.
    from flax import struct

    from gennet_tpu.train.checkpoints import CheckpointManager

    @struct.dataclass
    class LegacyCNN:
        params: np.ndarray
        step: np.ndarray

    @struct.dataclass
    class CurrentCNN:
        params: np.ndarray
        step: np.ndarray
        ema: np.ndarray

    old = LegacyCNN(params=np.arange(6.0), step=np.asarray(5))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, old)
    mgr.close()

    fresh = CurrentCNN(params=np.zeros(6), step=np.asarray(0),
                       ema=np.full(6, -1.0))
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored, _ = mgr2.restore(fresh)
    np.testing.assert_array_equal(np.asarray(restored.params), old.params)
    np.testing.assert_array_equal(np.asarray(restored.ema), old.params)
    mgr2.close()


def test_checkpoint_same_layout_failure_reraises(tmp_path, monkeypatch):
    # A restore failure with NO structural mismatch (same field set) must
    # re-raise the original error instead of silently returning a
    # partially-fresh state through the numpy field-merge path.
    from flax import struct

    import gennet_tpu.train.checkpoints as ckpt_mod
    from gennet_tpu.train.checkpoints import CheckpointManager

    @struct.dataclass
    class State:
        a: np.ndarray

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, State(a=np.arange(3.0)))
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    boom = RuntimeError("transient I/O failure")

    def failing_restore(step, args=None):
        raise boom

    # Fail the structured restore only; the numpy fallback then sees a
    # structurally-identical state and must re-raise the original error.
    orig = mgr2._mgr.restore
    calls = {"n": 0}

    def restore_once_fails(step, args=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise boom
        return orig(step, args=args)

    monkeypatch.setattr(mgr2._mgr, "restore", restore_once_fails)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="transient I/O failure"):
        mgr2.restore(State(a=np.zeros(3)))
    mgr2.close()


def test_posterior_whiteness_event_norm_validation():
    """VERDICT r4 #4: re-validate the whiteness statistic at the event norm
    against a known-perfect synthetic case.

    Constructs the exact flagship geometry: measured = (signal + unit
    whitened noise) * norm with norm = 1/std, so the noise floor in
    normalized units is std = norm (= effective_n_sig). Asserts:
    (1) a perfectly-subtracting posterior cloud passes (var_pass ≈ 1);
    (2) an unsubtracted event fails;
    (3) a DISPERSED but centred cloud passes the mean-waveform gate and
        the dispersion-corrected per-draw variance, while the naive
        per-draw variance fails — the measured r4 flagship artifact
        (whiteness_final 0.087 with res_loss 9e-4)."""
    from gennet_tpu.eval.whiteness import posterior_whiteness, whiteness_score

    rng = np.random.default_rng(0)
    n = 1024
    t = np.linspace(0.0, 1.0, n)
    signal = 2.0 * np.sin(40.0 * np.pi * t) * np.exp(-((t - 0.5) / 0.1) ** 2)
    noise = rng.normal(size=n)
    measured = signal + noise
    norm = 1.0 / measured.std()
    measured, signal = measured * norm, signal * norm  # noise std = norm now

    # (1) perfect subtraction: 64 identical truth draws
    perfect = np.tile(signal[None, :], (64, 1))
    ws = posterior_whiteness(measured, perfect, norm)
    assert ws["var_pass"] == 1.0 and ws["mean_pass"] == 1.0
    assert ws["ljung_box_pass"] == 1.0
    assert ws["draws"]["var_pass"] == 1.0

    # (2) unsubtracted event: zero generator
    ws0 = posterior_whiteness(measured, np.zeros((64, n)), norm)
    assert ws0["var_pass"] == 0.0

    # (3) dispersed centred cloud: draws = truth + independent waveform
    # perturbations at 3/4 of the noise floor
    draws = signal[None, :] + 0.75 * norm * rng.normal(size=(64, n))
    wsd = posterior_whiteness(measured, draws, norm)
    assert wsd["var_pass"] == 1.0, wsd          # mean-waveform gate passes
    assert wsd["draws"]["var_pass"] > 0.9, wsd  # corrected per-draw passes
    naive = whiteness_score(measured[None, :] - draws, norm)
    assert naive["var_pass"] < 0.1, naive       # the r4 artifact, pinned
