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
