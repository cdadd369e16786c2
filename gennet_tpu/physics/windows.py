"""Window functions (jit-safe, statically shaped).

Replaces the reference's hand-copied scipy Tukey window
(ref: gw_template_maker.py:87-113) with a closed-form vectorized version that
matches it exactly (including the reference's floor() width convention).
"""

import jax.numpy as jnp
import numpy as np


def tukey(M: int, alpha: float = 0.5, dtype=jnp.float32) -> jnp.ndarray:
    """Tukey (tapered cosine) window of length ``M``.

    Matches the reference implementation bit-for-bit in float64: the taper
    half-width is ``floor(alpha*(M-1)/2)`` and the flat region spans the
    remaining central samples (ref: gw_template_maker.py:102-113).

    ``M`` and ``alpha`` must be static (Python) values — the window is a
    compile-time constant folded into the XLA program, which is exactly what
    we want for the fixed whitening/window shapes in the bank pipeline.
    """
    if M <= 0:
        return jnp.zeros((0,), dtype)
    if M == 1 or alpha <= 0.0:
        return jnp.ones((M,), dtype)

    n = np.arange(M, dtype=np.float64)
    width = int(np.floor(alpha * (M - 1) / 2.0))
    w = np.ones(M, dtype=np.float64)

    left = n[: width + 1]
    w[: width + 1] = 0.5 * (1 + np.cos(np.pi * (-1 + 2.0 * left / alpha / (M - 1))))
    right = n[M - width - 1 :]
    w[M - width - 1 :] = 0.5 * (
        1 + np.cos(np.pi * (-2.0 / alpha + 1 + 2.0 * right / alpha / (M - 1)))
    )
    return jnp.asarray(w, dtype)


def centered_tukey_window(N: int, safe: int = 2, alpha: float = 1.0 / 8.0, dtype=jnp.float32) -> jnp.ndarray:
    """The reference's "aggressive" signal-extraction window.

    A Tukey window of length ``(16/15)·N/safe`` placed at the centre of an
    otherwise-zero length-``N`` window, so the taper has dropped to 50% at the
    central-T_obs boundaries (ref: gw_template_maker.py:533-538).
    """
    w = np.zeros(N, dtype=np.float64)
    tempwin = np.asarray(tukey(int((16.0 / 15.0) * N / safe), alpha=alpha, dtype=jnp.float64))
    start = int((N - tempwin.size) / 2)
    w[start : start + tempwin.size] = tempwin
    return jnp.asarray(w, dtype)
