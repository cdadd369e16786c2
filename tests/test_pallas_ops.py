"""Pallas kernel correctness (interpret mode on the CPU test mesh; the same
kernels run compiled on TPU where the bank pipeline selects them)."""

import numpy as np
import jax
import jax.numpy as jnp

from gennet_tpu.ops import dft
from gennet_tpu.ops.phasor_dft import phasor_irdft_slice, phasor_matmul


def test_phasor_matmul_matches_dense():
    rng = np.random.default_rng(0)
    B, K, T = 8, 256, 128
    amp = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32) ** 2)
    ph = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(K, T)).astype(np.float32))
    S = jnp.asarray(rng.normal(size=(K, T)).astype(np.float32))
    out = phasor_matmul(amp, ph, C, S, bm=8, bk=128, bt=128, interpret=True)
    ref = (amp * jnp.cos(ph)) @ C + (amp * jnp.sin(ph)) @ S
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_phasor_irdft_slice_matches_xla_path():
    rng = np.random.default_rng(1)
    B, N = 8, 1024
    nf, nfp = N // 2 + 1, 640  # padded to lane multiple
    amp = np.zeros((B, nfp), np.float32)
    amp[:, 40:nf - 1] = rng.normal(size=(B, nf - 41)).astype(np.float32) ** 2
    ph = (3 * rng.normal(size=(B, nfp))).astype(np.float32)
    amp_j, ph_j = jnp.asarray(amp), jnp.asarray(ph)
    re = amp_j[:, :nf] * jnp.cos(ph_j[:, :nf])
    im = -amp_j[:, :nf] * jnp.sin(ph_j[:, :nf])
    w = tuple(float(x) for x in np.hanning(256))
    ref = np.asarray(dft.irdft_slice(re, im, N, 384, 256, weights=w))
    out = np.asarray(phasor_irdft_slice(amp_j, ph_j, N, 384, 256, weights=w, interpret=True))
    scale = np.abs(ref).max() + 1e-12
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-5)
