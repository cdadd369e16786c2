"""Pallas TPU kernel: 1-D convolution as K shifted MXU matmuls.

The model stack's hot layers are SAME-padded width-5 1-D convolutions with
large channel counts (BBHGenerator walks 128→256→512→1024 channels at
length 1024; ref topology: bbhMahoGANy.py:418-520). XLA lowers `nn.Conv` to
a 2-D convolution with a degenerate spatial dim; this kernel instead keeps
the natural (rows, channels) matmul form the MXU wants:

    out[b, l, co] = Σ_k  x_pad[b, l + k, :] @ W[k, :, co]

i.e. K matmuls of a (bl, Cin) row window against (Cin, Cout) tap matrices,
accumulated in VMEM. The row window (one halo of K−1 rows per L-block) is
DMA'd from HBM once per (batch, L-block) and reused across all Cout blocks
— TPU grids execute sequentially per core, so VMEM scratch persists across
the innermost grid steps. Bias add and the model's activation fuse into the
same kernel (VPU, before the single HBM write of the output tile).

Stride-2 layers reuse the stride-1 kernel and slice the output — the MXU
work doubles, but for the flagship's stride-2 layers (the discriminator
front) the simplicity wins until profiling says otherwise.

STATUS (r4 scaling study, out/scaling_study.log): measured UNIFORMLY
slower than XLA's conv lowering for the GAN train step at every batch
(8/64/256 → 0.23/0.23/0.20 MFU vs XLA's 0.28/0.34/0.35), so
``conv_impl='xla'`` is the flagship default and this kernel is DEMOTED to
a measurement baseline: it is kept (tested, correct) solely so the
scaling-study comparison stays reproducible (`scripts/bench_scaling.py`,
`scripts/bench_conv_impl.py`). The Pallas win that shipped is the bank
builder's phasor-iDFT (`ops/phasor_dft.py`), not this conv.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_act(y, act: str, slope: float):
    if act == "tanh":
        return jnp.tanh(y)
    if act == "leaky_relu":
        return jnp.where(y >= 0, y, slope * y)
    if act == "relu":
        return jnp.maximum(y, 0.0)
    return y


def _conv1d_kernel(x_hbm, w_ref, b_ref, o_ref, xwin, sem, *, K, bl, W, act, slope):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # one haloed row-window DMA per (b, i); reused across Cout blocks j.
    # W = bl + K - 1 rounded up to the sublane tile (8) — Mosaic requires
    # 8-aligned slice shapes on the second-minor dim.
    @pl.when(j == 0)
    def _():
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * bl, W), :], xwin, sem
        )
        dma.start()
        dma.wait()

    acc = jnp.dot(xwin[0:bl], w_ref[0], preferred_element_type=jnp.float32)
    for k in range(1, K):
        acc += jnp.dot(xwin[k:k + bl], w_ref[k], preferred_element_type=jnp.float32)
    o_ref[0] = _apply_act(acc + b_ref[0], act, slope)


@partial(jax.jit, static_argnames=("act", "slope", "bl", "bc", "interpret"))
def conv1d_same(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                act: str = "none", slope: float = 0.2,
                bl: int = 256, bc: int = 256, interpret: bool = False):
    """SAME stride-1 conv1d + bias + activation on the MXU.

    x: (B, L, Cin); w: (K, Cin, Cout); bias: (Cout,). K odd. Returns
    (B, L, Cout) float32. L is padded to the row-tile bl and Cout to the
    lane-tile bc internally; Cin is used whole (≤ a few thousand fits VMEM).
    """
    B, L, Cin = x.shape
    K, _, Cout = w.shape
    assert K % 2 == 1, K
    pad = (K - 1) // 2

    bl = min(bl, max(8, L))
    bl = ((bl + 7) // 8) * 8            # sublane-tile aligned row block
    Lp = ((L + bl - 1) // bl) * bl
    bc = min(bc, max(128, Cout))
    Cp = ((Cout + bc - 1) // bc) * bc
    W = bl + K - 1
    W += (-W) % 8                       # 8-aligned DMA window shape
    Cin_p = ((Cin + 127) // 128) * 128  # 128-lane-aligned contract dim

    # SAME zero padding + row-tile padding (+ halo-alignment tail so the
    # last block's W-row window stays in bounds) + lane padding of the
    # contract dim, one HBM-resident operand
    xp = jnp.pad(x, ((0, 0), (pad, pad + (Lp - L) + (W - (bl + K - 1))),
                     (0, Cin_p - Cin)))
    wp = jnp.pad(w, ((0, 0), (0, Cin_p - Cin), (0, Cp - Cout)))
    bp = jnp.pad(bias, (0, Cp - Cout)).reshape(1, Cp)

    grid = (B, Lp // bl, Cp // bc)
    out = pl.pallas_call(
        partial(_conv1d_kernel, K=K, bl=bl, W=W, act=act, slope=slope),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((K, Cin_p, bc), lambda b, i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bl, bc), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, Cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((W, Cin_p), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * K * Cin * Cp,
            bytes_accessed=4 * (B * Lp * Cin + K * Cin * Cp + B * Lp * Cp),
            transcendentals=B * Lp * Cp if act == "tanh" else 0,
        ),
        interpret=interpret,
    )(xp, wp, bp)
    return out[:, :L, :Cout]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv1d_train(x, w, bias, bl: int = 256, bc: int = 256,
                 interpret: bool = False):
    """Differentiable SAME stride-1 conv1d (Pallas fwd + bwd).

    Backward: dx is the same kernel with taps flipped and in/out channels
    transposed (SAME stride-1 is self-transposing for odd K); dw/db are K
    shifted (rows × rows) contractions left to XLA — they are plain matmuls
    over the (B·L, C) axes and fuse with the surrounding graph.
    """
    return conv1d_same(x, w, bias, act="none", bl=bl, bc=bc,
                       interpret=interpret)


def _conv1d_train_fwd(x, w, bias, bl, bc, interpret):
    return (conv1d_same(x, w, bias, act="none", bl=bl, bc=bc,
                        interpret=interpret), (x, w))


def _conv1d_train_bwd(bl, bc, interpret, res, dy):
    x, w = res
    K = w.shape[0]
    pad = (K - 1) // 2
    wT = jnp.transpose(w[::-1], (0, 2, 1))  # (K, Cout, Cin), taps flipped
    dx = conv1d_same(dy, wT, jnp.zeros((w.shape[1],), dy.dtype), act="none",
                     bl=bl, bc=bc, interpret=interpret)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    L = x.shape[1]
    # dw[k, ci, co] = Σ_{b,l} x_pad[b, l+k, ci] · dy[b, l, co]
    dw = jnp.stack(
        [jnp.einsum("bli,blo->io", jax.lax.dynamic_slice_in_dim(xp, k, L, 1), dy)
         for k in range(K)], axis=0)
    db = jnp.sum(dy, axis=(0, 1))
    return dx, dw, db


conv1d_train.defvjp(_conv1d_train_fwd, _conv1d_train_bwd)


def conv1d(x, w, bias, stride: int = 1, act: str = "none", slope: float = 0.2,
           bl: int = 256, bc: int = 256, interpret: bool = False):
    """conv1d_same with stride support (stride>1 slices the stride-1 output).

    Matches XLA SAME semantics: for stride s the conv pads pad_total//2 low
    (pad_total = (⌈L/s⌉−1)·s + K − L), while the stride-1 kernel pads
    (K−1)/2 symmetrically — the strided output is the stride-1 output
    sampled every s taps starting at the offset between the two."""
    y = conv1d_same(x, w, bias, act=act, slope=slope, bl=bl, bc=bc,
                    interpret=interpret)
    if stride == 1:
        return y
    L = x.shape[1]
    K = w.shape[0]
    out_len = -(-L // stride)
    pad_low = max((out_len - 1) * stride + K - L, 0) // 2
    off = (K - 1) // 2 - pad_low
    return y[:, off::stride, :][:, :out_len, :]
