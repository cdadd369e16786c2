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


def test_phasor_matmul_grad_matches_dense():
    # jax.grad through the kernel (custom VJP) vs grad of the dense formula
    # — exercised for real by posterior ML recentering, which differentiates
    # the whole BBH template synthesis (eval/posterior_post.ml_recenter)
    rng = np.random.default_rng(3)
    B, K, T = 8, 256, 128
    amp = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32) ** 2)
    ph = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(K, T)).astype(np.float32))
    S = jnp.asarray(rng.normal(size=(K, T)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))

    loss_k = lambda a, p: jnp.sum(
        w * phasor_matmul(a, p, C, S, bm=8, bk=128, bt=128, interpret=True))
    loss_d = lambda a, p: jnp.sum(
        w * ((a * jnp.cos(p)) @ C + (a * jnp.sin(p)) @ S))
    ga_k, gp_k = jax.grad(loss_k, argnums=(0, 1))(amp, ph)
    ga_d, gp_d = jax.grad(loss_d, argnums=(0, 1))(amp, ph)
    np.testing.assert_allclose(np.asarray(ga_k), np.asarray(ga_d),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gp_k), np.asarray(gp_d),
                               rtol=2e-3, atol=2e-3)

    # table cotangents: the tables are constants in current callers, but a
    # zero cotangent would be silently wrong for any future differentiation
    # w.r.t. them (ADVICE r3)
    lossC_k = lambda c, s: jnp.sum(
        w * phasor_matmul(amp, ph, c, s, bm=8, bk=128, bt=128, interpret=True))
    lossC_d = lambda c, s: jnp.sum(
        w * ((amp * jnp.cos(ph)) @ c + (amp * jnp.sin(ph)) @ s))
    gc_k, gs_k = jax.grad(lossC_k, argnums=(0, 1))(C, S)
    gc_d, gs_d = jax.grad(lossC_d, argnums=(0, 1))(C, S)
    np.testing.assert_allclose(np.asarray(gc_k), np.asarray(gc_d),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gs_k), np.asarray(gs_d),
                               rtol=2e-3, atol=2e-3)


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


def _flax_conv_ref(x, w, b, stride):
    import jax.lax as lax

    # flax nn.Conv SAME semantics (NWC / WIO)
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))+ b


def test_pallas_conv1d_matches_xla_stride1():
    from gennet_tpu.ops.pallas_conv1d import conv1d

    rng = np.random.default_rng(2)
    B, L, Cin, Cout, K = 2, 64, 16, 256, 5
    x = jnp.asarray(rng.normal(size=(B, L, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    ref = _flax_conv_ref(x, w, b, 1)
    out = conv1d(x, w, b, stride=1, bl=32, bc=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_conv1d_matches_xla_stride2_and_acts():
    from gennet_tpu.ops.pallas_conv1d import conv1d

    rng = np.random.default_rng(3)
    B, L, Cin, Cout, K = 2, 64, 8, 128, 5
    x = jnp.asarray(rng.normal(size=(B, L, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
    ref = _flax_conv_ref(x, w, b, 2)
    out = conv1d(x, w, b, stride=2, bl=32, bc=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    # fused activations
    out_t = conv1d(x, w, b, stride=1, act="tanh", bl=32, bc=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out_t),
                               np.tanh(np.asarray(_flax_conv_ref(x, w, b, 1))),
                               rtol=2e-4, atol=2e-4)
    out_l = conv1d(x, w, b, stride=1, act="leaky_relu", bl=32, bc=128, interpret=True)
    r = np.asarray(_flax_conv_ref(x, w, b, 1))
    np.testing.assert_allclose(np.asarray(out_l), np.where(r >= 0, r, 0.2 * r),
                               rtol=2e-4, atol=2e-4)


def test_pallas_conv1d_ragged_shapes():
    from gennet_tpu.ops.pallas_conv1d import conv1d

    rng = np.random.default_rng(4)
    # L not a multiple of bl, Cout not a multiple of bc
    B, L, Cin, Cout, K = 1, 48, 4, 96, 3
    x = jnp.asarray(rng.normal(size=(B, L, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, Cin, Cout)).astype(np.float32))
    b = jnp.zeros((Cout,), jnp.float32)
    ref = _flax_conv_ref(x, w, b, 1)
    out = conv1d(x, w, b, stride=1, bl=32, bc=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_conv1d_train_grads_match_xla():
    from gennet_tpu.ops.pallas_conv1d import conv1d_train

    rng = np.random.default_rng(5)
    B, L, Cin, Cout, K = 2, 32, 8, 128, 5
    x = jnp.asarray(rng.normal(size=(B, L, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, Cin, Cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))

    def loss_pallas(x, w, b):
        y = conv1d_train(x, w, b, 32, 128, True)
        return jnp.sum(jnp.sin(y) * y)

    def loss_xla(x, w, b):
        y = _flax_conv_ref(x, w, b, 1)
        return jnp.sum(jnp.sin(y) * y)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_p, g_x):
        scale = np.abs(np.asarray(r)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(r) / scale,
                                   rtol=1e-3, atol=1e-4)


def test_model_conv_impl_parity():
    """BBHGenerator/PairDiscriminator produce identical outputs under
    conv_impl='xla' and 'pallas' with the SAME param tree (the param paths
    are pinned via explicit layer names)."""
    from gennet_tpu.models.generator import BBHGenerator
    from gennet_tpu.models.discriminator import PairDiscriminator

    kw = dict(n_out=256, features=(64, 128, 256))
    g_x = BBHGenerator(conv_impl="xla", **kw)
    g_p = BBHGenerator(conv_impl="pallas", **kw)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 100))
    v = g_x.init(jax.random.PRNGKey(1), z)
    jax.tree_util.tree_map(lambda a, b: None, v["params"],
                           g_p.init(jax.random.PRNGKey(1), z)["params"])  # same structure
    y_x = g_x.apply(v, z)
    y_p = g_p.apply(v, z)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=2e-4, atol=2e-5)

    d_x = PairDiscriminator(conv_impl="xla", features=(64, 128))
    d_p = PairDiscriminator(conv_impl="pallas", features=(64, 128))
    pair = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 2))
    vd = d_x.init(jax.random.PRNGKey(3), pair)
    l_x = d_x.apply(vd, pair)
    l_p = d_p.apply(vd, pair)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x),
                               rtol=2e-4, atol=2e-4)
