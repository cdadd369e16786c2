"""Minke/MDC waveform ingestion and injection-set synthesis.

Covers the gen-3 data path (ref: train_on_wvf_version/load_txtwfs.py,
ht_noise_subtract_version/load_txtwfs.py) and the MDC tooling
(ref: make_hw-xml.py / make-hw-frames.py ×3 copies):

- :func:`load_txt_waveforms` — read minke-generated two-column txt
  waveforms, resample to a fixed length, peak-normalize, apply a random
  roll offset (ref: load_txtwfs.py:31-77).
- :func:`make_sine_gaussian_mdc` — synthesize the hardware-injection MDC
  set the reference built through minke (SineGaussian q=15, f∈[100,200] Hz;
  ref: make_hw-xml.py) natively in JAX, written as npz. Frame/XML output
  requires lalsuite/minke and is documented host-side interop, not a TPU
  kernel (SURVEY.md §2.4) — the waveform content itself is generated here.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def load_txt_waveforms(pattern: str, n_out: int = 512, roll_range: int = 100,
                       seed: int = 0, normalize: bool = True) -> np.ndarray:
    """Load txt waveforms matching ``pattern``; scipy-resample each to
    ``n_out`` samples, peak-normalize, and apply a random ±roll_range roll
    (ref: load_txtwfs.py:36-77)."""
    from scipy.signal import resample

    rng = np.random.default_rng(seed)
    out = []
    for path in sorted(glob.glob(pattern)):
        raw = np.loadtxt(path)
        series = raw[:, 1] if raw.ndim == 2 else raw
        w = resample(series, n_out)
        if normalize and np.max(np.abs(w)) > 0:
            w = w / np.max(np.abs(w))
        w = np.roll(w, int(rng.integers(-roll_range, roll_range + 1)))
        out.append(w)
    if not out:
        raise FileNotFoundError(f"no waveforms match {pattern!r}")
    return np.asarray(out, np.float32)


def make_sine_gaussian_mdc(key: jax.Array, n: int, fs: int = 16384, duration: float = 1.0,
                           q: float = 15.0, f_range=(100.0, 200.0), hrss: float = 1e-22):
    """Sine-Gaussian hardware-injection set: q=15, centre frequency uniform
    in f_range (ref: make_hw-xml.py's minke SineGaussian parameters). Returns
    (waveforms [n, fs·duration], params dict) in physical strain·1e21 units.

    h(t) = h_peak sin(2πf₀(t−t₀)) exp(−(2πf₀(t−t₀)/(2q))²) with h_peak set
    from the requested hrss: hrss² = ∫h² dt ≈ h_peak²·τ√(π/2)/2, τ=q/(πf₀√2).
    """
    from gennet_tpu.physics.constants import STRAIN_SCALE

    kf, kt = jax.random.split(key)
    n_samp = int(fs * duration)
    f0 = jax.random.uniform(kf, (n, 1), minval=f_range[0], maxval=f_range[1])
    t0 = duration * (0.4 + 0.2 * jax.random.uniform(kt, (n, 1)))
    t = jnp.arange(n_samp)[None, :] / fs
    tau = q / (jnp.sqrt(2.0) * jnp.pi * f0)
    h_peak = hrss * STRAIN_SCALE / jnp.sqrt(tau * jnp.sqrt(jnp.pi / 2.0) / 2.0)
    x = t - t0
    h = h_peak * jnp.sin(2 * jnp.pi * f0 * x) * jnp.exp(-((x / tau) ** 2))
    return h, {"f0": f0[:, 0], "t0": t0[:, 0], "q": jnp.full((n,), q), "hrss": jnp.full((n,), hrss)}


def save_mdc_npz(path: str, waveforms, params: dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, waveforms=np.asarray(waveforms),
                        **{k: np.asarray(v) for k, v in params.items()})
