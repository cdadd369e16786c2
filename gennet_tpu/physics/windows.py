"""Window functions (jit-safe, statically shaped).

Replaces the reference's hand-copied scipy Tukey window
(ref: gw_template_maker.py:87-113) with a closed-form vectorized version that
matches it exactly (including the reference's floor() width convention).

Windows are built in numpy (compile-time constants folded into the XLA
program) and converted to device arrays at the boundary — under JAX's
tracing they must never round-trip through traced ops.
"""

import jax.numpy as jnp
import numpy as np


def tukey_np(M: int, alpha: float = 0.5) -> np.ndarray:
    """Tukey window as float64 numpy (see :func:`tukey`)."""
    if M <= 0:
        return np.zeros((0,), np.float64)
    if M == 1 or alpha <= 0.0:
        return np.ones((M,), np.float64)

    n = np.arange(M, dtype=np.float64)
    width = int(np.floor(alpha * (M - 1) / 2.0))
    w = np.ones(M, dtype=np.float64)
    left = n[: width + 1]
    w[: width + 1] = 0.5 * (1 + np.cos(np.pi * (-1 + 2.0 * left / alpha / (M - 1))))
    right = n[M - width - 1 :]
    w[M - width - 1 :] = 0.5 * (
        1 + np.cos(np.pi * (-2.0 / alpha + 1 + 2.0 * right / alpha / (M - 1)))
    )
    return w


def tukey(M: int, alpha: float = 0.5, dtype=jnp.float32) -> jnp.ndarray:
    """Tukey (tapered cosine) window of length ``M``.

    Matches the reference implementation in float64: the taper half-width is
    ``floor(alpha*(M-1)/2)`` and the flat region spans the remaining central
    samples (ref: gw_template_maker.py:102-113).

    ``M`` and ``alpha`` must be static (Python) values — the window is a
    compile-time constant folded into the XLA program.
    """
    return jnp.asarray(tukey_np(M, alpha).astype(np.dtype(dtype)))


def centered_tukey_window_np(N: int, safe: int = 2, alpha: float = 1.0 / 8.0) -> np.ndarray:
    """Numpy form of :func:`centered_tukey_window`."""
    w = np.zeros(N, dtype=np.float64)
    tempwin = tukey_np(int((16.0 / 15.0) * N / safe), alpha=alpha)
    start = int((N - tempwin.size) / 2)
    w[start : start + tempwin.size] = tempwin
    return w


def centered_tukey_window(N: int, safe: int = 2, alpha: float = 1.0 / 8.0, dtype=jnp.float32) -> jnp.ndarray:
    """The reference's "aggressive" signal-extraction window.

    A Tukey window of length ``(16/15)·N/safe`` placed at the centre of an
    otherwise-zero length-``N`` window, so the taper has dropped to 50% at the
    central-T_obs boundaries (ref: gw_template_maker.py:533-538).
    """
    w = centered_tukey_window_np(N, safe, alpha)
    return jnp.asarray(w.astype(np.dtype(dtype)))
