"""Pallas TPU kernel: fused phasor → inverse real DFT.

The template-bank hot path ends with h[b,t] = Σ_k A[b,k]·cos(Ψ[b,k])·C[k,t]
+ A[b,k]·sin(Ψ[b,k])·S[k,t] (h̃ = A e^{−iΨ}, C/S the inverse-rDFT constant
tables, see :mod:`gennet_tpu.ops.dft`). Unfused, XLA materializes the
(B, Nf) re/im phasor arrays in HBM (~134 MB each at bank batch sizes) and
reads them back for the matmuls; this kernel computes the trig on the VPU
per-tile in VMEM and feeds the MXU directly — the phasor never touches HBM.

Tiling: grid (B/bm, T/bt, K/bk), K innermost so the output tile stays
VMEM-resident across the reduction; A/Ψ tiles stream once per (i, j).
Frequency-axis padding is the caller's job (pad amp with zeros — padded
bins then contribute exactly 0 regardless of phase/table content).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phasor_kernel(a_ref, p_ref, c_ref, s_ref, o_ref):
    k = pl.program_id(2)
    amp = a_ref[:]
    ph = p_ref[:]
    re = amp * jnp.cos(ph)
    im = amp * jnp.sin(ph)
    acc = jnp.dot(re, c_ref[:], preferred_element_type=jnp.float32) + jnp.dot(
        im, s_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k > 0)
    def _():
        o_ref[:] += acc


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _phasor_matmul_prim(amp, phase, cos_t, sin_t, bm, bk, bt, interpret):
    """Differentiable wrapper: pallas_call has no autodiff rules, but this
    op is linear in (amp·cosΨ, amp·sinΨ), so the VJP is closed-form —
    needed e.g. by posterior ML recentering, which runs jax.grad through
    the whole template synthesis (eval/posterior_post.ml_recenter)."""
    return _phasor_pallas(amp, phase, cos_t, sin_t, bm, bk, bt, interpret)


def _phasor_fwd(amp, phase, cos_t, sin_t, bm, bk, bt, interpret):
    out = _phasor_pallas(amp, phase, cos_t, sin_t, bm, bk, bt, interpret)
    return out, (amp, phase, cos_t, sin_t)


def _phasor_bwd(bm, bk, bt, interpret, res, g):
    # out[b,t] = Σ_k amp cosφ C[k,t] + amp sinφ S[k,t]
    #   ∂/∂amp = cosφ·(g Cᵀ) + sinφ·(g Sᵀ)
    #   ∂/∂φ   = amp·(cosφ·(g Sᵀ) − sinφ·(g Cᵀ))
    # Plain XLA matmuls: the backward pass is off the bank hot path, and
    # the (B, K) intermediates it materializes are exactly what the forward
    # kernel exists to avoid — acceptable where gradients are needed.
    amp, phase, cos_t, sin_t = res
    gc = g @ cos_t.T
    gs = g @ sin_t.T
    re = amp * jnp.cos(phase)
    im = amp * jnp.sin(phase)
    d_amp = jnp.cos(phase) * gc + jnp.sin(phase) * gs
    d_phase = im * (-gc) + re * gs
    # True table cotangents (∂out/∂C[k,t] = Σ_b re[b,k]·g[b,t]); the tables
    # are constants in every current caller, but a zero cotangent would be
    # silently wrong for any future caller differentiating w.r.t. them.
    d_cos = (re.T @ g).astype(cos_t.dtype)
    d_sin = (im.T @ g).astype(sin_t.dtype)
    return (d_amp.astype(amp.dtype), d_phase.astype(phase.dtype), d_cos, d_sin)


_phasor_matmul_prim.defvjp(_phasor_fwd, _phasor_bwd)


@partial(jax.jit, static_argnames=("bm", "bk", "bt", "interpret"))
def phasor_matmul(amp: jnp.ndarray, phase: jnp.ndarray, cos_t: jnp.ndarray, sin_t: jnp.ndarray,
                  bm: int = 256, bk: int = 512, bt: int = 1024, interpret: bool = False):
    """out[b,t] = Σ_k amp·cos(phase)·cos_t + amp·sin(phase)·sin_t.

    Shapes: amp/phase (B, K); cos_t/sin_t (K, T); B % bm == K % bk ==
    T % bt == 0 (pad K with zero-amp bins; see module docstring).
    Differentiable w.r.t. amp/phase via a closed-form VJP.
    """
    return _phasor_matmul_prim(amp, phase, cos_t, sin_t, bm, bk, bt, interpret)


def _phasor_pallas(amp, phase, cos_t, sin_t, bm, bk, bt, interpret):
    B, K = amp.shape
    T = cos_t.shape[1]
    assert B % bm == 0 and K % bk == 0 and T % bt == 0, (B, K, T, bm, bk, bt)

    grid = (B // bm, T // bt, K // bk)
    return pl.pallas_call(
        _phasor_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bt), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bt), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bt), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * K * T,
            bytes_accessed=4 * (2 * B * K + 2 * K * T + B * T),
            transcendentals=2 * B * K * (T // bt),
        ),
        interpret=interpret,
    )(amp, phase, cos_t, sin_t)


def _pad_tables(cos_t: np.ndarray, sin_t: np.ndarray, k_pad: int):
    K = cos_t.shape[0]
    if K == k_pad:
        return cos_t, sin_t
    pad = ((0, k_pad - K), (0, 0))
    return np.pad(cos_t, pad), np.pad(sin_t, pad)


def phasor_irdft_slice(amp: jnp.ndarray, phase: jnp.ndarray, N: int, start: int, width: int,
                       weights: tuple | None = None, interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas equivalent of
    ``dft.irdft_slice(amp·cos(−Ψ), amp·sin(−Ψ)·(−1), …)`` for h̃ = A e^{−iΨ}:
    inverse-transform onto output samples [start, start+width) mod N with
    optional folded per-sample weights.

    amp/phase: (B, Kp) where Kp ≥ N//2+1 is a multiple of the K tile
    (extra rows must carry amp == 0).
    """
    from gennet_tpu.ops.dft import _irdft_slice_tables

    B, Kp = amp.shape
    cos_np, sin_np = _irdft_slice_tables(N, start, width, weights)
    cos_np, sin_np = _pad_tables(cos_np, sin_np, Kp)

    # tile sizes: rows 256 (or B), reduction 512 | Kp, output min(width, 1024)
    bm = min(256, B)
    b_pad = ((B + bm - 1) // bm) * bm
    if b_pad != B:  # row-pad to the tile size (padded rows are discarded)
        pad = ((0, b_pad - B), (0, 0))
        amp = jnp.pad(amp, pad)
        phase = jnp.pad(phase, pad)
    bk = 512 if Kp % 512 == 0 else 128
    bt = width if width <= 1024 else 1024
    while width % bt:
        bt //= 2
    out = phasor_matmul(
        amp, phase, jnp.asarray(cos_np), jnp.asarray(sin_np),
        bm=bm, bk=bk, bt=bt, interpret=interpret,
    )
    return out[:B]
