"""Train-step tests: shapes, finiteness, determinism, and data-parallel
equivalence on the virtual CPU mesh (SURVEY.md §4 multi-chip test story)."""

import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp
import pytest

# every test here compiles at least one training program: slow tier
pytestmark = pytest.mark.slow

from gennet_tpu.models import (
    BBHGenerator,
    BurstDiscriminator,
    BurstGenerator,
    BurstPE,
    DualBranchPE,
    PairDiscriminator,
)
from gennet_tpu.train import (
    CNNConfig,
    GANConfig,
    init_cnn,
    init_gan,
    make_cnn_step,
    make_gan_step,
)
from gennet_tpu.train import cnn as cnn_mod
from gennet_tpu.train import gan as gan_mod
from gennet_tpu.train.mesh import data_mesh
from gennet_tpu.physics.burst import make_burst_bank


N_PIX = 256  # small for CPU test speed


@pytest.fixture(scope="module")
def burst_setup():
    cfg = GANConfig(
        n_pix=N_PIX, batch_size=8, pair_discriminator=False,
        residual_route=True, n_sig=0.25, lr=2e-4,
    )
    G = BurstGenerator(n_out=N_PIX)
    D = BurstDiscriminator()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank, pars = make_burst_bank(jax.random.PRNGKey(1), 64, N=N_PIX)
    measured = bank[0] + 0.25 * jax.random.normal(jax.random.PRNGKey(2), (N_PIX,))
    return cfg, G, D, state, bank, pars, measured


def test_burst_gan_step_runs_and_updates(burst_setup):
    cfg, G, D, state, bank, pars, measured = burst_setup
    step = make_gan_step(G, D, cfg)
    s1, m = step(state, bank, measured, jax.random.PRNGKey(3))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    # parameters actually moved
    leaf0 = jax.tree_util.tree_leaves(state.g_params)[0]
    leaf1 = jax.tree_util.tree_leaves(s1.g_params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
    assert int(s1.step) == 1


def test_gan_step_deterministic(burst_setup):
    cfg, G, D, state, bank, pars, measured = burst_setup
    step = make_gan_step(G, D, cfg)
    s1, m1 = step(state, bank, measured, jax.random.PRNGKey(3))
    s2, m2 = step(state, bank, measured, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(m1["g_loss"]), np.asarray(m2["g_loss"]))
    l1 = jax.tree_util.tree_leaves(s1.g_params)[0]
    l2 = jax.tree_util.tree_leaves(s2.g_params)[0]
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_gan_dp_single_device_mesh_matches_unsharded(burst_setup):
    # shard_map wrapper on a 1-device mesh must reproduce the plain step
    # exactly (bit-compared, SURVEY.md §4 multi-node replacement test)
    cfg, G, D, state, bank, pars, measured = burst_setup
    plain = make_gan_step(G, D, cfg)
    mesh1 = data_mesh(1)
    dp = make_gan_step(G, D, cfg, mesh=mesh1)
    key = jax.random.PRNGKey(7)
    s_a, m_a = plain(state, bank, measured, jax.random.fold_in(key, 0))
    s_b, m_b = dp(state, bank, measured, key)
    np.testing.assert_allclose(float(m_a["d_loss"]), float(m_b["d_loss"]), rtol=1e-6)
    la = jax.tree_util.tree_leaves(s_a.d_params)[0]
    lb = jax.tree_util.tree_leaves(s_b.d_params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-7)


class _PlainG(nn.Module):
    """Dropout/BN-free generator so the DP-math invariant is exact (dropout
    masks and batch-norm statistics are per-device by construction in DP)."""

    n_out: int = N_PIX

    @nn.compact
    def __call__(self, z, train: bool = False):
        x = nn.tanh(nn.Dense(64)(z))
        x = nn.Dense(self.n_out)(x)
        return x[..., None]


class _PlainD(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.tanh(nn.Conv(8, (5,), strides=(2,), padding="SAME")(x))
        return nn.Dense(1)(x.reshape(x.shape[0], -1))


def _concat_gan_batches(batches):
    """Concatenate per-device GANBatch pytrees along the batch axis: the
    global batch of the mathematically-equivalent single-device step."""
    b0 = batches[0]
    return gan_mod.GANBatch(
        z1=jnp.concatenate([b.z1 for b in batches], axis=0),
        real=jnp.concatenate([b.real for b in batches], axis=0),
        fresh=jnp.concatenate([b.fresh for b in batches], axis=0),
        in_real=(None if b0.in_real is None
                 else jnp.concatenate([b.in_real for b in batches], axis=0)),
        in_fake=(None if b0.in_fake is None
                 else jnp.concatenate([b.in_fake for b in batches], axis=0)),
        in_g=(None if b0.in_g is None
              else jnp.concatenate([b.in_g for b in batches], axis=1)),
        y_real=jnp.concatenate([b.y_real for b in batches], axis=0),
        y_fake=jnp.concatenate([b.y_fake for b in batches], axis=0),
        z2=(None if b0.z2 is None
            else jnp.concatenate([b.z2 for b in batches], axis=0)),
        z3=jnp.concatenate([b.z3 for b in batches], axis=1),
        kfake=b0.kfake, kd=b0.kd, kres=b0.kres, kg=b0.kg,  # unused: no dropout
    )


def test_gan_dp_8_matches_global_batch():
    """The DP-math invariant (SURVEY §4): an 8-shard pmean'd GAN step equals
    a single-device step on the concatenation of the 8 per-device batches,
    to float32 tolerance. Exercises pair-D, residual route, label smoothing,
    instance noise, the d_acc gate, and 2 G steps per iteration."""
    from functools import partial

    n_dev = 8
    cfg = GANConfig(
        n_pix=N_PIX, batch_size=4, pair_discriminator=True,
        residual_route=True, n_sig=0.25, lr=2e-4,
        label_smoothing=True, d_instance_noise=0.3,
        d_acc_gate=0.9, g_steps_per_iter=2, d_lr_scale=0.5,
    )
    G, D = _PlainG(), _PlainD()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank = jax.random.normal(jax.random.PRNGKey(1), (64, N_PIX))
    measured = jax.random.normal(jax.random.PRNGKey(2), (N_PIX,))
    key = jax.random.PRNGKey(5)

    mesh = data_mesh(n_dev)
    dp = make_gan_step(G, D, cfg, mesh=mesh)
    s_dp, m_dp = dp(state, bank, measured, key)

    # reference: replicate the per-device draws exactly (same key folding,
    # same bank shards), concatenate, run one unsharded update
    shards = bank.reshape(n_dev, -1, N_PIX)
    batches = [
        gan_mod.draw_gan_batch(jax.random.fold_in(key, d), shards[d], cfg)
        for d in range(n_dev)
    ]
    global_batch = _concat_gan_batches(batches)
    update = jax.jit(partial(gan_mod.gan_update, generator=G, discriminator=D, cfg=cfg))
    s_ref, m_ref = update(state, global_batch, measured)

    for name in ("d_loss", "d_acc", "g_loss", "res_loss"):
        np.testing.assert_allclose(float(m_dp[name]), float(m_ref[name]),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    for tree_name in ("g_params", "d_params"):
        a = jax.tree_util.tree_leaves(getattr(s_dp, tree_name))
        b = jax.tree_util.tree_leaves(getattr(s_ref, tree_name))
        for la, lb in zip(a, b):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-4, atol=1e-6, err_msg=tree_name)


def test_cnn_dp_8_matches_global_batch():
    """Same invariant for the CNN PE step (dropout-free model)."""
    from functools import partial

    class PlainPE(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.tanh(nn.Conv(8, (5,), strides=(2,), padding="SAME")(x))
            return nn.Dense(2)(x.reshape(x.shape[0], -1))

    n_dev = 8
    cfg = CNNConfig(n_pix=N_PIX, batch_size=4, noise_frac=0.25)
    model = PlainPE()
    state = init_cnn(jax.random.PRNGKey(0), model, cfg)
    bank, pars = make_burst_bank(jax.random.PRNGKey(1), 64, N=N_PIX)
    key = jax.random.PRNGKey(9)

    dp = make_cnn_step(model, cfg, mesh=data_mesh(n_dev))
    s_dp, m_dp = dp(state, bank, pars, key)

    bank_sh = bank.reshape(n_dev, -1, N_PIX)
    pars_sh = pars.reshape(n_dev, -1, pars.shape[-1])
    xs, ys = [], []
    for d in range(n_dev):
        x, y, kdrop = cnn_mod.draw_cnn_batch(jax.random.fold_in(key, d),
                                             bank_sh[d], pars_sh[d], cfg)
        xs.append(x)
        ys.append(y)
    update = jax.jit(partial(cnn_mod.cnn_update, model=model, cfg=cfg))
    s_ref, m_ref = update(state, jnp.concatenate(xs, 0), jnp.concatenate(ys, 0), kdrop)

    np.testing.assert_allclose(float(m_dp["pe_loss"]), float(m_ref["pe_loss"]),
                               rtol=1e-5, atol=1e-7)
    for la, lb in zip(jax.tree_util.tree_leaves(s_dp.params),
                      jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-6)


def test_gan_dp_8_device_mesh(burst_setup):
    cfg, G, D, state, bank, pars, measured = burst_setup
    mesh = data_mesh(8)
    dp = make_gan_step(G, D, cfg, mesh=mesh)
    bank8 = jnp.tile(bank, (2, 1))  # 128 rows → 16 per device
    s1, m = dp(state, bank8, measured, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["d_loss"]))
    assert np.isfinite(float(m["g_loss"]))
    # replicated state stays consistent across devices (psum'd grads)
    leaf = jax.tree_util.tree_leaves(s1.g_params)[0]
    assert not np.isnan(np.asarray(leaf)).any()


@pytest.mark.slowest  # 110s CPU: dual compile equivalence; bounded slow tier excludes it
def test_gan_step_scan_matches_sequential(burst_setup):
    """The scan-fused multi-step program equals the same steps applied
    sequentially with the same per-step keys (relay-latency amortization
    must not change the math)."""
    from functools import partial

    cfg, G, D, state, bank, pars, measured = burst_setup
    key = jax.random.PRNGKey(11)
    scan3 = gan_mod.make_gan_step_scan(G, D, cfg, 3)
    s_scan, m_scan = scan3(state, bank, measured, key)

    step = jax.jit(partial(gan_mod.gan_step, generator=G, discriminator=D, cfg=cfg))
    s_seq = state
    keys = jax.random.split(key, 3)
    for k in keys:
        s_seq, m_seq = step(s_seq, bank, measured, k)

    np.testing.assert_allclose(float(m_scan["g_loss"][-1]), float(m_seq["g_loss"]),
                               rtol=1e-6)
    # scan-compiled vs separately-jitted programs fuse differently; float32
    # reassociation through Adam leaves ~1e-5-scale differences (lr here is
    # 2e-4, so this is ~3% of one update on a handful of elements)
    for la, lb in zip(jax.tree_util.tree_leaves(s_scan.g_params),
                      jax.tree_util.tree_leaves(s_seq.g_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-3,
                                   atol=5e-5)
    assert int(s_scan.step) == int(s_seq.step) == 3
    assert m_scan["d_loss"].shape == (3,)


def test_cnn_step_scan_matches_sequential():
    from functools import partial

    cfg = CNNConfig(n_pix=N_PIX, batch_size=8, noise_frac=0.0)
    model = BurstPE()
    state = init_cnn(jax.random.PRNGKey(0), model, cfg)
    bank, pars = make_burst_bank(jax.random.PRNGKey(1), 64, N=N_PIX)
    key = jax.random.PRNGKey(4)

    scan4 = cnn_mod.make_cnn_step_scan(model, cfg, 4)
    s_scan, m_scan = scan4(state, bank, pars, key)

    step = jax.jit(partial(cnn_mod.cnn_step, model=model, cfg=cfg))
    s_seq = state
    for k in jax.random.split(key, 4):
        s_seq, _ = step(s_seq, bank, pars, k)

    for la, lb in zip(jax.tree_util.tree_leaves(s_scan.params),
                      jax.tree_util.tree_leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5,
                                   atol=1e-7)
    assert m_scan["pe_loss"].shape == (4,)


def test_bbh_pair_gan_step():
    cfg = GANConfig(n_pix=N_PIX, batch_size=4, pair_discriminator=True)
    G = BBHGenerator(n_out=N_PIX, features=(32, 32, 32, 32, 32))
    D = PairDiscriminator(features=(32, 64))
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank = jax.random.normal(jax.random.PRNGKey(1), (32, N_PIX))
    measured = jax.random.normal(jax.random.PRNGKey(2), (N_PIX,))
    step = make_gan_step(G, D, cfg)
    s1, m = step(state, bank, measured, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    # batch_stats (G batchnorm) must update in the G train route
    st0 = jax.tree_util.tree_leaves(state.g_stats)[0]
    st1 = jax.tree_util.tree_leaves(s1.g_stats)[0]
    assert not np.allclose(np.asarray(st0), np.asarray(st1))


def test_generator_sampling_shapes():
    cfg = GANConfig(n_pix=N_PIX, batch_size=4, pair_discriminator=False)
    G = BurstGenerator(n_out=N_PIX)
    D = BurstDiscriminator()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    x = gan_mod.sample_generator(G, state, jax.random.PRNGKey(1), 17, cfg)
    assert x.shape == (17, N_PIX)
    assert not np.isnan(np.asarray(x)).any()


def test_cnn_step_loss_decreases():
    cfg = CNNConfig(n_pix=N_PIX, batch_size=32, lr=1e-3, noise_frac=0.0)
    model = BurstPE()
    state = init_cnn(jax.random.PRNGKey(0), model, cfg)
    bank, pars = make_burst_bank(jax.random.PRNGKey(1), 256, N=N_PIX)
    step = make_cnn_step(model, cfg)
    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        state, m = step(state, bank, pars, sub)
        losses.append(float(m["pe_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.5 * losses[0]


def test_cnn_noise_augmentation_fraction():
    # with noise_frac=1/8 and batch 8, exactly 1 sample gets noise:
    # run two steps with huge noise scale and confirm loss is still finite
    cfg = CNNConfig(n_pix=N_PIX, batch_size=8, noise_frac=1.0 / 8.0, noise_scale_max=5.0)
    model = BurstPE()
    state = init_cnn(jax.random.PRNGKey(0), model, cfg)
    bank, pars = make_burst_bank(jax.random.PRNGKey(1), 64, N=N_PIX)
    step = make_cnn_step(model, cfg)
    state, m = step(state, bank, pars, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["pe_loss"]))


def test_cnn_dp_mesh():
    cfg = CNNConfig(n_pix=N_PIX, batch_size=4)
    model = BurstPE()
    state = init_cnn(jax.random.PRNGKey(0), model, cfg)
    bank, pars = make_burst_bank(jax.random.PRNGKey(1), 64, N=N_PIX)
    mesh = data_mesh(8)
    step = make_cnn_step(model, cfg, mesh=mesh)
    s1, m = step(state, bank, pars, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["pe_loss"]))


def test_dualbranch_pe_output_range():
    model = DualBranchPE()
    cfg = CNNConfig(n_pix=1024, batch_size=2)
    state = init_cnn(jax.random.PRNGKey(0), model, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 1024))
    out = cnn_mod.predict(model, state, x)
    assert out.shape == (4, 2)
    # q head is clipped to [0, 1] (ReLU max_value=1, ref: bbhMahoGANy.py:400)
    assert (np.asarray(out[:, 1]) >= 0).all() and (np.asarray(out[:, 1]) <= 1).all()


def test_generator_ema_tracks_params():
    cfg = GANConfig(n_pix=N_PIX, batch_size=4, pair_discriminator=False,
                    residual_route=True, n_sig=0.25, g_ema_decay=0.9)
    G, D = BurstGenerator(n_out=N_PIX), BurstDiscriminator()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank, _ = make_burst_bank(jax.random.PRNGKey(1), 32, N=N_PIX)
    measured = bank[0]
    step = make_gan_step(G, D, cfg)
    s1, _ = step(state, bank, measured, jax.random.PRNGKey(2))
    # ema moved toward new params but lags them
    p0 = jax.tree_util.tree_leaves(state.g_params)[0]
    p1 = jax.tree_util.tree_leaves(s1.g_params)[0]
    e1 = jax.tree_util.tree_leaves(s1.g_ema)[0]
    np.testing.assert_allclose(np.asarray(e1), 0.9 * np.asarray(p0) + 0.1 * np.asarray(p1),
                               rtol=1e-5, atol=1e-7)
    # sampling with use_ema differs from raw-params sampling after divergence
    from gennet_tpu.train.gan import sample_generator

    a = sample_generator(G, s1, jax.random.PRNGKey(3), 4, cfg, use_ema=True)
    b = sample_generator(G, s1, jax.random.PRNGKey(3), 4, cfg, use_ema=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_gan_step_r1_penalty_runs_and_regularizes(burst_setup):
    """R1-enabled step runs and its D gradients differ from the plain step
    (the penalty actually contributes)."""
    from dataclasses import replace as dc_replace

    cfg, G, D, state, bank, pars, measured = burst_setup
    cfg_r1 = dc_replace(cfg, r1_gamma=1.0, d_instance_noise=0.25)
    cfg_plain = dc_replace(cfg, r1_gamma=0.0, d_instance_noise=0.25)
    s_r1, m_r1 = make_gan_step(G, D, cfg_r1)(state, bank, measured, jax.random.PRNGKey(3))
    s_pl, m_pl = make_gan_step(G, D, cfg_plain)(state, bank, measured, jax.random.PRNGKey(3))
    assert np.isfinite(float(m_r1["d_loss"]))
    assert float(m_r1["d_loss"]) > float(m_pl["d_loss"])  # penalty added
    la = jax.tree_util.tree_leaves(s_r1.d_params)[0]
    lb = jax.tree_util.tree_leaves(s_pl.d_params)[0]
    assert not np.allclose(np.asarray(la), np.asarray(lb))


def test_gan_anneal_knobs_freeze_d_and_adversarial(burst_setup):
    """Terminal-anneal knobs (d_acc_gate<0, adv_weight=0): D params must not
    move; G must still move via the residual route."""
    import jax.numpy as jnp

    from gennet_tpu.train.gan import knobs_from_cfg, make_gan_step

    cfg, G, D, state, bank, pars, measured = burst_setup
    step = make_gan_step(G, D, cfg)
    knobs = knobs_from_cfg(cfg).replace(
        d_acc_gate=jnp.asarray(-1.0, jnp.float32),
        adv_weight=jnp.asarray(0.0, jnp.float32))
    new_state, m = step(state, bank, measured, jax.random.PRNGKey(7), knobs)
    # D frozen
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.d_params, new_state.d_params)
    # G moved (residual route active)
    moved = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree_util.tree_map(lambda a, b: a - b, state.g_params,
                               new_state.g_params), 0.0)
    assert moved > 0.0


@pytest.mark.slow
@pytest.mark.slowest
def test_flagship_full_shapes_on_8_device_mesh():
    """VERDICT r2 item 7: one scan-fused step of the EXACT flagship
    BBHGenerator()/PairDiscriminator() shapes over the 8-CPU mesh (the
    dryrun uses shrunken features). `slowest` tier: this single compile
    dominates the slow tier's wall clock (VERDICT r3 #7) — the bounded
    slow tier is -m 'slow and not slowest'."""
    from gennet_tpu.models import BBHGenerator, PairDiscriminator
    from gennet_tpu.train.gan import make_gan_step_scan

    mesh = jax.make_mesh((8,), ("data",))
    cfg = GANConfig(n_pix=1024, batch_size=1, pair_discriminator=True,
                    label_smoothing=True, d_instance_noise=0.3,
                    d_lr_scale=0.5, d_acc_gate=0.9)
    G, D = BBHGenerator(n_out=1024), PairDiscriminator()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank = jax.random.normal(jax.random.PRNGKey(1), (64, 1024))
    measured = jax.random.normal(jax.random.PRNGKey(2), (1024,))
    step = make_gan_step_scan(G, D, cfg, 2, mesh=mesh)
    state, m = step(state, bank, measured, jax.random.PRNGKey(3))
    assert m["d_loss"].shape == (2,)
    for v in m.values():
        assert bool(jnp.isfinite(v).all())


@pytest.mark.slow
def test_bank_sharded_matches_single_device():
    """make_bank_sharded determinism: the 8-device sharded bank equals the
    same per-shard generation run without a mesh (keys folded identically)."""
    from gennet_tpu.data import template_bank as tb
    from gennet_tpu.physics import psd as psd_mod

    cfg = tb.BankConfig()
    psd = psd_mod.analytic_advligo_psd(cfg.fs, cfg.T_obs * cfg.safe)
    mesh = jax.make_mesh((8,), ("data",))
    key = jax.random.PRNGKey(11)
    t1, _ = tb.make_bank_sharded(key, 32, psd, mesh, cfg)
    t2, _ = tb.make_bank_sharded(key, 32, psd, mesh, cfg)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert np.isfinite(np.asarray(t1)).all()


@pytest.mark.slowest  # 48s CPU: 600-step training loop; bounded slow tier excludes it
def test_res_eval_mode_constrains_eval_output():
    """res_eval_mode pins the generator's EVAL-mode output to the event:
    after res-route-only training, eval-mode draws must move toward the
    measured series (the r2 flagship's eval draws were unconstrained)."""
    from gennet_tpu.models import BBHGenerator, PairDiscriminator
    from gennet_tpu.train.gan import make_gan_step_scan, sample_generator

    n_pix = 64
    # n_sig small: the route drives the residual to N(0, n_sig^2), so the
    # eval-mode RMS to the measured series must approach n_sig
    cfg = GANConfig(n_pix=n_pix, batch_size=8, lr=2e-3, n_sig=0.05,
                    pair_discriminator=True, residual_route=True,
                    res_loss_weight=10.0, res_eval_mode=True)
    G = BBHGenerator(n_out=n_pix, features=(16, 16, 16, 16, 16))
    D = PairDiscriminator(features=(8, 8))
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank = jax.random.normal(jax.random.PRNGKey(1), (32, n_pix))
    measured = jnp.sin(jnp.linspace(0, 6.0, n_pix))

    def eval_rms(st):
        wf = sample_generator(G, st, jax.random.PRNGKey(5), 64, cfg, chunk=64,
                              dropout=False)
        return float(jnp.sqrt(jnp.mean((wf - measured[None, :]) ** 2)))

    before = eval_rms(state)
    step = make_gan_step_scan(G, D, cfg, 50)
    state, m = step(state, bank, measured, jax.random.PRNGKey(2))
    state, m = step(state, bank, measured, jax.random.PRNGKey(3))
    after = eval_rms(state)
    assert jnp.isfinite(m["res_loss"]).all()
    assert after < 0.5 * before, (before, after)


def test_bbh_gan_step_bf16_compute_path():
    """The bf16 flag threads compute dtype into G/D (params stay f32);
    one step must run finite and actually update parameters."""
    from gennet_tpu.models import BBHGenerator, PairDiscriminator
    from gennet_tpu.train.gan import make_gan_step

    n_pix = 128
    cfg = GANConfig(n_pix=n_pix, batch_size=4, pair_discriminator=True)
    G = BBHGenerator(n_out=n_pix, features=(16, 16, 16, 16, 16),
                     dtype=jnp.bfloat16)
    D = PairDiscriminator(features=(8, 8), dtype=jnp.bfloat16)
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    leaves = jax.tree_util.tree_leaves(state.g_params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # params stay f32
    bank = jax.random.normal(jax.random.PRNGKey(1), (16, n_pix))
    measured = jax.random.normal(jax.random.PRNGKey(2), (n_pix,))
    step = make_gan_step(G, D, cfg)
    new_state, m = step(state, bank, measured, jax.random.PRNGKey(3))
    assert all(bool(jnp.isfinite(v)) for v in m.values())
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.g_params, new_state.g_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0


def test_gan_debug_probes_metrics(burst_setup):
    """debug_probes adds per-term health metrics (grad norms per route,
    logit extremes, BN-var min) — the NaN-bisect instrument (VERDICT r3 #3)."""
    import dataclasses

    cfg, G, D, state, bank, pars, measured = burst_setup
    dcfg = dataclasses.replace(cfg, debug_probes=True)
    step = make_gan_step(G, D, dcfg)
    _, m = step(state, bank, measured, jax.random.PRNGKey(7))
    for k in ("d_grad_norm", "g_grad_norm", "res_grad_norm", "g_param_norm",
              "d_param_norm", "x_fake_absmax", "d_logit_absmax", "bn_var_min"):
        assert k in m, k
        assert bool(jnp.isfinite(m[k])), (k, m[k])
    assert float(m["d_grad_norm"]) > 0 and float(m["g_grad_norm"]) > 0
    assert float(m["res_grad_norm"]) > 0  # residual route active
    assert float(m["bn_var_min"]) > 0  # BN running variance stays positive


def test_gan_ch1_only_with_instance_noise_updates():
    """The r4 scheme fix (pair_d=False): D judges the waveform channel only,
    instance noise active on BOTH the D update and the G route (in_g), the
    residual-moment route anchors G to the event. Regression for the proven
    pair-scheme pathology (D memorizes the fixed event noise in ch2 — see
    scripts/d_memorization_probe.py / ROUND4-STATUS.md)."""
    cfg = GANConfig(
        n_pix=N_PIX, batch_size=4, pair_discriminator=False,
        residual_route=True, res_loss_weight=3.0, n_sig=0.25, lr=2e-4,
        label_smoothing=True, d_instance_noise=0.5, d_acc_gate=0.9,
    )
    G, D = _PlainG(), _PlainD()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank = jax.random.normal(jax.random.PRNGKey(1), (64, N_PIX))
    measured = jax.random.normal(jax.random.PRNGKey(2), (N_PIX,))
    step = make_gan_step(G, D, cfg)
    new_state = state
    for i in range(2):
        new_state, m = step(new_state, bank, measured, jax.random.PRNGKey(7 + i))
    for k in ("d_loss", "g_loss", "res_loss", "d_acc", "g_acc"):
        assert bool(jnp.isfinite(m[k])), (k, m[k])
    # the batch draw materializes the G-route instance noise
    b = gan_mod.draw_gan_batch(jax.random.PRNGKey(9), bank, cfg)
    assert b.in_g is not None and b.in_g.shape == (1, 4, N_PIX, 1)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.g_params, new_state.g_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0


def test_run_bbh_rejects_pair_d_false_without_res_route(tmp_path):
    import pytest

    from gennet_tpu.cli.workloads import BBHConfig, run_bbh

    with pytest.raises(ValueError, match="pair_d"):
        run_bbh(BBHConfig(pair_d=False, res_loss_weight=0.0,
                          out_dir=str(tmp_path / "x")))


def test_residual_spectral_loss_discriminates_and_flows():
    """The banded-periodogram whiteness target (r4): near-floor on true
    white noise, large when a chirp-like signal is left in the residual
    (where the 2-moment loss barely moves — the measured r4 failure), and
    differentiable. Also exercises the GANConfig.res_spectral_bands wiring
    through a train step."""
    from gennet_tpu.train import losses as L

    rng = np.random.default_rng(0)
    white = jnp.asarray(rng.normal(size=(8, 1024)))
    t = np.arange(1024) / 1024
    sig = jnp.asarray(2.0 * np.sin(2 * np.pi * (40 * t + 120 * t**2))
                      * np.exp(-(((t - 0.8) / 0.15) ** 2)))
    l_white = float(L.residual_spectral_loss(white, 1.0, 32))
    l_sig = float(L.residual_spectral_loss(white + sig, 1.0, 32))
    m_white = float(L.residual_moment_loss(white, 1.0))
    m_sig = float(L.residual_moment_loss(white + sig, 1.0))
    assert l_sig > 10 * l_white, (l_sig, l_white)
    # the moment loss also discriminates on this loud toy chirp — its BBH
    # failure was absolute scale under the measured-normalization (zero-G
    # optimal), which test_effective_n_sig_is_event_noise_std pins on the
    # real event; here just require both move in the right direction
    assert m_sig > m_white
    g = jax.grad(lambda s: L.residual_spectral_loss(white + s, 1.0, 32))(sig)
    assert bool(jnp.isfinite(g).all()) and float(jnp.linalg.norm(g)) > 0

    cfg = GANConfig(n_pix=N_PIX, batch_size=4, pair_discriminator=False,
                    residual_route=True, res_loss_weight=3.0,
                    res_spectral_bands=16, n_sig=0.25, lr=2e-4)
    G, D = _PlainG(), _PlainD()
    state = init_gan(jax.random.PRNGKey(0), G, D, cfg)
    bank = jax.random.normal(jax.random.PRNGKey(1), (64, N_PIX))
    measured = jax.random.normal(jax.random.PRNGKey(2), (N_PIX,))
    step = make_gan_step(G, D, cfg)
    s1, m = step(state, bank, measured, jax.random.PRNGKey(7))
    assert bool(jnp.isfinite(m["res_loss"])) and float(m["res_loss"]) > 0


def test_effective_n_sig_is_event_noise_std():
    """The event's residual targets must use the ACTUAL noise std in
    normalized units (= the norm constant), not the config n_sig.

    Root-caused r4: measured is normalized to std exactly 1.0, so with the
    old target n_sig²=1.0 a zero generator was the GLOBAL OPTIMUM of the
    residual-moment loss (residual = measured, var = 1.0 = target) — the
    measured 'res_loss ~1e-3 with the posterior 50σ off' failure. With the
    corrected target (norm ≈ event-noise std), G=0 is heavily penalized
    and perfect subtraction is the optimum."""
    from gennet_tpu.cli.workloads import BBHConfig, effective_n_sig
    from gennet_tpu.data import template_bank as tb
    from gennet_tpu.physics import psd as psd_mod
    from gennet_tpu.train import losses as L

    bc = tb.BankConfig()
    psd = psd_mod.analytic_advligo_psd(bc.fs, bc.T_obs * bc.safe)
    sig, meas, norm = tb.make_event(jax.random.PRNGKey(0), psd, bc)
    noise = meas - sig
    # norm IS the noise std in normalized units (to a few %: the signal
    # inflates std(measured) slightly)
    assert abs(float(jnp.std(noise)) - float(norm)) < 0.05 * float(norm)

    cfg = BBHConfig()
    ns = effective_n_sig(cfg, float(norm))
    assert ns == pytest.approx(float(norm))
    assert effective_n_sig(BBHConfig(n_sig_event=False), float(norm)) == cfg.n_sig

    for loss in (lambda r: L.residual_moment_loss(r, ns),
                 lambda r: L.residual_spectral_loss(r, ns, 32)):
        at_zero_g = float(loss(meas[None, :]))      # unsubtracted
        at_perfect = float(loss(noise[None, :]))    # perfect subtraction
        assert at_zero_g > 10 * at_perfect, (at_zero_g, at_perfect)
    # the OLD (n_sig=1.0) moment target preferred the zero generator —
    # keep this as the canary documenting the failure mode
    old = BBHConfig(n_sig_event=False).n_sig
    assert float(L.residual_moment_loss(meas[None, :], old)) < \
        float(L.residual_moment_loss(noise[None, :], old))


def test_gan_real_bank_twin_boost():
    """twin_boost re-includes the event-twin waveform in the GAN's real
    bank (boost copies appended), leaving the PE bank untouched.

    The r4 memorization probe measured the reference's twin EXCLUSION
    (ref: bbhMahoGANy.py:1031-1037) as an anti-truth cue: the one waveform
    D never sees as real is exactly G's target, so D learns to score it
    below bank templates (−1.7 logits) and adversarial pressure repels G
    from the truth."""
    from gennet_tpu.cli.workloads import BBHConfig, gan_real_bank

    bank = jnp.asarray(np.random.default_rng(0).normal(size=(16, 32)),
                       jnp.float32)
    signal = jnp.asarray(np.random.default_rng(1).normal(size=(32,)),
                         jnp.float32)

    # parity default: untouched (same object, no copy)
    assert gan_real_bank(BBHConfig(), bank, signal) is bank
    assert gan_real_bank(BBHConfig(twin_boost=4), None, signal) is None

    boosted = gan_real_bank(BBHConfig(twin_boost=4), bank, signal)
    assert boosted.shape == (20, 32)
    np.testing.assert_array_equal(np.asarray(boosted[:16]), np.asarray(bank))
    for row in np.asarray(boosted[16:]):
        np.testing.assert_array_equal(row, np.asarray(signal))


def test_gan_real_bank_mesh_rounding():
    """Under a DP mesh the boosted bank must divide the device count; the
    boost rounds UP with extra twin copies."""
    from gennet_tpu.cli.workloads import BBHConfig, gan_real_bank
    from gennet_tpu.train.mesh import data_mesh

    mesh = data_mesh(8)
    bank = jnp.zeros((24, 16), jnp.float32)
    signal = jnp.ones((16,), jnp.float32)
    out = gan_real_bank(BBHConfig(twin_boost=3), bank, signal, mesh=mesh)
    assert out.shape[0] % 8 == 0 and out.shape[0] == 32  # 3 -> 8 copies
