"""Truth-free posterior post-processing (eval/posterior_post.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from gennet_tpu.eval import posterior_post as pp
from gennet_tpu.physics.burst import sine_gaussian

# N=128 at dt=1/512 -> window [0, 0.25) s; keep t0/tau well inside
N_PIX = 128
DT = 1.0 / 512
SYNTH = lambda s: sine_gaussian(s[:, 0], s[:, 1], N=N_PIX)
TGRID = np.arange(N_PIX) * DT


def moment_estimator(bias):
    """Closed-form (t0, τ) estimator from envelope moments of w², plus a
    known constant bias — a stand-in for the biased CNN."""
    b = np.asarray(bias)

    def est(w):
        w2 = np.asarray(w) ** 2
        p = w2 / (w2.sum(axis=1, keepdims=True) + 1e-30)
        t0 = p @ TGRID
        m2 = (p * (TGRID[None, :] - t0[:, None]) ** 2).sum(axis=1)
        tau = 2.0 * np.sqrt(np.maximum(m2, 1e-12))
        return np.column_stack([t0, tau]) + b[None, :]

    return est


def test_self_calibrate_removes_constant_bias():
    rng = np.random.default_rng(0)
    true = np.column_stack([rng.uniform(0.10, 0.15, 256),
                            rng.uniform(0.02, 0.04, 256)])
    est = moment_estimator([0.004, -0.003])
    samples = est(np.asarray(SYNTH(jnp.asarray(true))))  # biased cloud
    fixed = pp.self_calibrate(samples, SYNTH, est,
                              jax.random.PRNGKey(0), n_sig=0.005, rounds=2)
    err_before = np.abs(samples - true).mean(axis=0)
    err_after = np.abs(fixed - true).mean(axis=0)
    # the constant bias is measured and removed (estimator self-noise stays)
    assert (err_after < 0.5 * err_before).all(), (err_before, err_after)


def test_likelihood_resample_concentrates_on_truth():
    truth = np.array([0.125, 0.03])
    measured = np.asarray(SYNTH(jnp.asarray(truth[None, :]))[0])
    n_sig = 0.1
    measured = measured + n_sig * np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (N_PIX,)))
    # over-dispersed proposal around the truth
    rng = np.random.default_rng(2)
    cloud = truth[None, :] + rng.normal(0, [0.01, 0.008], size=(2000, 2))
    cloud[:, 1] = np.clip(cloud[:, 1], 0.005, 0.08)
    res = pp.likelihood_resample(cloud, SYNTH, measured, n_sig,
                                 jax.random.PRNGKey(3), temper=1.0)
    # resampled cloud is tighter and centered on the truth
    assert res[:, 1].std() < 0.6 * cloud[:, 1].std()
    assert abs(res[:, 0].mean() - truth[0]) < 0.005
    assert abs(res[:, 1].mean() - truth[1]) < 0.005
    ess = pp.effective_sample_size(cloud, SYNTH, measured, n_sig)
    assert 1.0 < ess < 1000.0  # weights genuinely informative
