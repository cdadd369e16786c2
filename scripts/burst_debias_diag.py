"""Burst seed-1/2 failure diagnosis: exact grid geometry + oracle corrections.

Measured conclusion (r3): the exact posterior t0 stripe is one grid node
wide for every seed; the default recipe cloud misses it by a -1.9e-3 s
estimator bias. Oracle debias recovers overlap 0.88; likelihood
resampling delta-collapses (ESS~8) and stays at 0.0004. Run on CPU.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo")
from gennet_tpu.physics.burst import sine_gaussian
from gennet_tpu.eval import grid_posterior as gp

for seed in (0, 1, 2):
    key = jax.random.PRNGKey(seed)
    k_bank, k_event, k_noise, key = jax.random.split(key, 4)
    signal = sine_gaussian(0.5, 1.0/25.0, N=512)
    measured = signal + 0.25 * jax.random.normal(k_noise, signal.shape)
    L, gx, gy = gp.burst_grid_posterior(measured, 0.25, 95)
    mx, my, sx, sy = gp.grid_moments(L, gx, gy)
    Ln = np.asarray(L, np.float64); Ln /= Ln.sum()
    # stripe geometry: mass per t0 node, top nodes
    pt0 = Ln.sum(axis=0)  # L is (tau, t0)
    ptau = Ln.sum(axis=1)
    top = np.argsort(pt0)[::-1][:4]
    print(f"seed {seed}: t0 mean {mx:.6f} std {sx:.3e}  tau mean {my:.6f} std {sy:.3e}")
    print(f"  t0 node spacing {gx[1]-gx[0]:.5f}; top t0 nodes {[(int(i), gx[i].round(4), pt0[i].round(3)) for i in top]}")
    print(f"  tau nodes with >1% mass: {int((ptau>0.01).sum())}")
    # oracle test: synthetic Gaussian cloud with the LOGGED final moments of default_s{seed}
    logged = {1: (-1093.28, -4.30, 1829.88, 0.5656), 2: (None,)*4}
    if seed == 1:
        b_t0, b_tau, d_t0, d_tau = logged[1]
        rng = np.random.default_rng(0)
        c_t0 = mx + b_t0*sx + rng.normal(0, d_t0*sx, 1000)
        c_tau = my + b_tau*sy + rng.normal(0, abs(d_tau)*sy, 1000)
        cloud = np.stack([c_t0, c_tau], -1)
        print(f"  reconstructed-cloud overlap: {gp.grid_overlap_score(cloud, L, gx, gy):.4f}")
        # oracle debias: remove the mean shift entirely
        cloud_db = cloud - cloud.mean(0) + np.array([mx, my])
        print(f"  oracle-debiased overlap:     {gp.grid_overlap_score(cloud_db, L, gx, gy):.4f}")
        # likelihood resample (exact formula) on the biased cloud
        t = np.arange(512)/512.0
        x = t[None,:] - cloud[:,0:1]
        templ = np.sin(2*np.pi*100.0*x + 2*np.pi)*np.exp(-(x**2)/cloud[:,1:2]**2)
        d = np.asarray(measured, np.float64)[None,:]
        logl = -0.5*np.sum(((d-templ)/0.25)**2, -1)
        for temper in (1.0, 0.5, 0.1):
            w = np.exp(temper*(logl - logl.max())); w/=w.sum()
            ess = 1.0/np.sum(w**2)
            idx = rng.choice(1000, 1000, p=w)
            print(f"  resample t={temper}: ESS {ess:.1f} overlap {gp.grid_overlap_score(cloud[idx], L, gx, gy):.4f}")

# tolerance: residual t0 bias vs overlap (seed 1 geometry)
key = jax.random.PRNGKey(1)
k_bank, k_event, k_noise, key = jax.random.split(key, 4)
signal = sine_gaussian(0.5, 1.0/25.0, N=512)
measured = signal + 0.25 * jax.random.normal(k_noise, signal.shape)
L, gx, gy = gp.burst_grid_posterior(measured, 0.25, 95)
mx, my, sx, sy = gp.grid_moments(L, gx, gy)
rng = np.random.default_rng(0)
base_t0 = rng.normal(0, 1829.88*sx, 1000); base_tau = rng.normal(0, 0.5656*sy, 1000)
print("residual-bias tolerance (t0_bias_s, tau_bias_sig -> overlap):")
for bt in (0.0, 2.5e-4, 5e-4, 1e-3, 2e-3):
    for btau in (0.0, 1.0):
        cloud = np.stack([mx + bt + base_t0, my + btau*sy + base_tau], -1)
        print(f"  t0+{bt:g}s tau+{btau:g}sig: {gp.grid_overlap_score(cloud, L, gx, gy):.3f}")

# ml_recenter on the seed-1 reconstruction: the truth-free analogue of the
# oracle debias — expect ~the oracle number (0.88) if the refined ML point
# lands on the exact posterior's node
from gennet_tpu.eval import posterior_post as pp
key = jax.random.PRNGKey(1)
k_bank, k_event, k_noise, key = jax.random.split(key, 4)
signal = sine_gaussian(0.5, 1.0/25.0, N=512)
measured = signal + 0.25 * jax.random.normal(k_noise, signal.shape)
L, gx, gy = gp.burst_grid_posterior(measured, 0.25, 95)
mx, my, sx, sy = gp.grid_moments(L, gx, gy)
rng = np.random.default_rng(0)
b_t0, b_tau, d_t0, d_tau = -1093.28, -4.30, 1829.88, 0.5656
cloud = np.stack([mx + b_t0*sx + rng.normal(0, d_t0*sx, 1000),
                  my + b_tau*sy + rng.normal(0, abs(d_tau)*sy, 1000)], -1)
synth = lambda s: sine_gaussian(s[:, 0], s[:, 1], N=512)
fixed = pp.ml_recenter(cloud, synth, measured, jax.random.PRNGKey(9))
print(f"ml_recenter overlap: {gp.grid_overlap_score(fixed, L, gx, gy):.4f} "
      f"(raw {gp.grid_overlap_score(cloud, L, gx, gy):.4f}; oracle 0.88)")
print(f"  center shift: {np.asarray(fixed.mean(0) - cloud.mean(0))} "
      f"vs needed {np.array([-b_t0*sx, -b_tau*sy])}")
