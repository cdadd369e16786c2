"""Real DFTs as batched matrix products (MXU-native, complex-free).

Replaces ``np.fft.rfft``/``irfft`` (ref: gw_template_maker.py:191,268,283,
521-522,775-777) on the TPU path. For the signal lengths in this framework
(N ≤ 8192) a dense DFT-matrix product is the TPU-idiomatic transform:

- one batched (B, Nf) × (Nf, N) matmul saturates the 128×128 MXU, whereas a
  radix FFT would serialize into many small, padding-hostile stages;
- the axon TPU runtime has no complex support and no XLA FFT at all, so a
  real formulation is required, not just preferred;
- the DFT matrices are compile-time constants (cached per (N, dtype)), so
  XLA folds and pipelines them from HBM.

Cost: 2·N·Nf MACs per transform ≈ 2·N²; at N=4096 and 1e5 transforms/s this
is ~3.4 TFLOP/s — a few percent of a v5e chip's matmul throughput.

Conventions match numpy: one-sided spectrum of length Nf = N//2 + 1;
x[n] = (1/N) Σ_k w_k (re_k cos(2πkn/N) − im_k sin(2πkn/N)), w_k = 2 except
w_0 = w_{N/2} = 1 (for even N).
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _irdft_tables(N: int) -> tuple[np.ndarray, np.ndarray]:
    Nf = N // 2 + 1
    k = np.arange(Nf)[:, None]
    n = np.arange(N)[None, :]
    ang = 2.0 * np.pi * k * n / N
    w = np.full((Nf, 1), 2.0)
    w[0] = 1.0
    if N % 2 == 0:
        w[-1] = 1.0
    cos_t = (w * np.cos(ang) / N).astype(np.float32)
    sin_t = (w * np.sin(ang) / N).astype(np.float32)
    return cos_t, sin_t


@lru_cache(maxsize=8)
def _rdft_tables(N: int) -> tuple[np.ndarray, np.ndarray]:
    Nf = N // 2 + 1
    n = np.arange(N)[:, None]
    k = np.arange(Nf)[None, :]
    ang = 2.0 * np.pi * n * k / N
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def irdft_matrices(N: int, dtype=jnp.float32):
    """(cos, sin) inverse-rDFT matrices of shape (Nf, N)."""
    c, s = _irdft_tables(N)
    return jnp.asarray(c, dtype), jnp.asarray(s, dtype)


def rdft_matrices(N: int, dtype=jnp.float32):
    """(cos, sin) forward-rDFT matrices of shape (N, Nf)."""
    c, s = _rdft_tables(N)
    return jnp.asarray(c, dtype), jnp.asarray(s, dtype)


def irdft(re: jnp.ndarray, im: jnp.ndarray, N: int) -> jnp.ndarray:
    """Inverse real DFT: (…, Nf) spectrum pair → (…, N) time series.

    Matches ``np.fft.irfft(re + 1j*im, N)``.
    """
    cos_t, sin_t = irdft_matrices(N, re.dtype)
    return jnp.matmul(re, cos_t, preferred_element_type=jnp.float32) - jnp.matmul(
        im, sin_t, preferred_element_type=jnp.float32
    )


@lru_cache(maxsize=32)
def _irdft_slice_tables(N: int, start: int, width: int, weights_key=None):
    cos_t, sin_t = _irdft_tables(N)
    cols = (np.arange(start, start + width)) % N
    c = cos_t[:, cols].copy()
    s = sin_t[:, cols].copy()
    if weights_key is not None:
        w = np.asarray(weights_key, np.float32)
        c *= w
        s *= w
    return c, s


def irdft_slice(re: jnp.ndarray, im: jnp.ndarray, N: int, start: int, width: int,
                weights: tuple | None = None) -> jnp.ndarray:
    """Inverse real DFT evaluated only on output samples
    ``[start, start+width) mod N`` — a column slice of the iDFT matrix, with
    optional per-output-sample ``weights`` (e.g. an extraction window) folded
    into the constant matrix at zero runtime cost.

    This is the TPU-native fusion of roll/window/crop postprocessing: slicing
    the columns makes the matmul proportionally cheaper, and wraparound
    column indexing gives circular semantics for free.

    ``weights`` must be a hashable tuple of floats of length ``width`` (it
    keys the constant-table cache).
    """
    cos_t, sin_t = _irdft_slice_tables(N, start, width, weights)
    return jnp.matmul(re, jnp.asarray(cos_t), preferred_element_type=jnp.float32) - jnp.matmul(
        im, jnp.asarray(sin_t), preferred_element_type=jnp.float32
    )


def rdft(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward real DFT: (…, N) time series → (re, im) pair of (…, Nf).

    Matches ``np.fft.rfft(x)``.
    """
    N = x.shape[-1]
    cos_t, sin_t = rdft_matrices(N, x.dtype)
    re = jnp.matmul(x, cos_t, preferred_element_type=jnp.float32)
    im = -jnp.matmul(x, sin_t, preferred_element_type=jnp.float32)
    return re, im
