"""Tests for the earlier-generation capability variants: blobs/image GAN
(gen-1), sinusoid toys + softmax GAN (gen-2/3), two-stage pretraining
(gen-4), MDC synthesis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennet_tpu.models.image_models import (
    ImageDiscriminator,
    ImageGenerator,
    ImageMCDropoutPE,
    ImagePE,
)
from gennet_tpu.models import DenseGenerator, SoftmaxDiscriminator, TransposeGenerator
from gennet_tpu.physics.blobs import blob_grid_posterior, gauss_blob_images, make_blob_bank
from gennet_tpu.physics.toys import gauss_pulse, sample_sinusoids
from gennet_tpu.train.softmax_gan import (
    SoftmaxGANConfig,
    init_softmax_gan,
    make_softmax_gan_step,
    pretrain_discriminator,
)
from gennet_tpu.train import two_stage
from gennet_tpu.train.gan import GANConfig
from gennet_tpu.models import BurstDiscriminator, BurstGenerator


# ------------------------------------------------------------------ blobs
def test_blob_images_match_reference_semantics():
    means = jnp.asarray([[0.5, 0.5], [0.2, 0.8]])
    imgs = np.asarray(gauss_blob_images(means, n_pix=28))
    assert imgs.shape == (2, 28, 28)
    # renormalized to [-1, 1] (ref: renorm, ganymede.py:425-432)
    assert imgs.max() == pytest.approx(1.0, abs=1e-5)
    assert imgs.min() == pytest.approx(-1.0, abs=1e-5)
    # blob peak at the mean location
    j = np.unravel_index(np.argmax(imgs[0]), (28, 28))
    assert abs(j[0] - 14) <= 1 and abs(j[1] - 14) <= 1


def test_blob_grid_posterior_peaks_at_truth():
    img, means = make_blob_bank(jax.random.PRNGKey(0), 1, n_pix=28)
    L, gx, gy = blob_grid_posterior(img[0], n_sig=0.1, grain=28)
    L = np.asarray(L)
    j, i = np.unravel_index(np.argmax(L), L.shape)
    assert gx[i] == pytest.approx(float(means[0, 0]), abs=0.08)
    assert gy[j] == pytest.approx(float(means[0, 1]), abs=0.08)


@pytest.mark.slow
def test_image_gan_models_forward():
    G, D, PE, MC = ImageGenerator(n_pix=28), ImageDiscriminator(), ImagePE(), ImageMCDropoutPE()
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(k, (2, 100))
    gv = G.init({"params": k}, z, train=False)
    img = G.apply(gv, z, train=False)
    assert img.shape == (2, 28, 28, 1)
    dv = D.init({"params": k, "dropout": k}, img, train=False)
    assert D.apply(dv, img, train=False).shape == (2, 1)
    pv = PE.init({"params": k}, img, train=False)
    assert PE.apply(pv, img, train=False).shape == (2, 2)
    mv = MC.init({"params": k, "dropout": k}, img, train=False)
    # MC dropout: repeated inference with different rngs gives different draws
    o1 = MC.apply(mv, img, train=False, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = MC.apply(mv, img, train=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


# ------------------------------------------------------------------ toys
def test_sinusoids_range():
    x = np.asarray(sample_sinusoids(jax.random.PRNGKey(0), 16))
    assert x.shape == (16, 50)
    assert x.min() >= 0.0 and x.max() <= 1.0


def test_gauss_pulse_shape():
    x = np.asarray(gauss_pulse(jax.random.PRNGKey(0), 4))
    assert x.shape == (4, 512)
    assert np.abs(x).max() == pytest.approx(1.0, abs=0.05)


# ------------------------------------------------------------ softmax GAN
@pytest.mark.slow
def test_softmax_gan_pretrain_and_step():
    cfg = SoftmaxGANConfig(n_out=50, latent_dim=10, batch_size=16)
    G = DenseGenerator(n_out=50, latent_dim=10)
    D = SoftmaxDiscriminator()
    state = init_softmax_gan(jax.random.PRNGKey(0), G, D, cfg)
    x = sample_sinusoids(jax.random.PRNGKey(1), 16)
    state, m = pretrain_discriminator(state, x, jax.random.PRNGKey(2),
                                      generator=G, discriminator=D, cfg=cfg)
    assert np.isfinite(float(m["d_loss"]))
    step = make_softmax_gan_step(G, D, cfg)
    for i in range(3):
        state, m = step(state, x, jax.random.PRNGKey(3 + i))
    assert np.isfinite(float(m["g_loss"]))
    assert int(state.step) == 3


@pytest.mark.slow
def test_softmax_gan_subtract_ht_variant():
    cfg = SoftmaxGANConfig(n_out=50, latent_dim=10, batch_size=8, subtract_ht=True)
    G = DenseGenerator(n_out=50, latent_dim=10)
    D = SoftmaxDiscriminator()
    state = init_softmax_gan(jax.random.PRNGKey(0), G, D, cfg)
    x = sample_sinusoids(jax.random.PRNGKey(1), 8)
    ht = jnp.asarray(np.random.default_rng(0).normal(size=50), jnp.float32)
    from gennet_tpu.train.softmax_gan import softmax_gan_step

    state, m = jax.jit(
        lambda s, xr, k: softmax_gan_step(s, xr, k, generator=G, discriminator=D,
                                          cfg=cfg, measured=ht)
    )(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["d_loss"]))


# -------------------------------------------------------------- two-stage
@pytest.mark.slow
def test_two_stage_pipeline_tiny():
    n_pix = 64
    cfg = GANConfig(n_pix=n_pix, batch_size=4, pair_discriminator=False, latent_dim=8)
    G = BurstGenerator(n_out=n_pix)
    D = BurstDiscriminator()
    bank = jnp.asarray(np.random.default_rng(0).normal(size=(16, n_pix)), jnp.float32)
    measured = bank[0]
    state, metrics = two_stage.run_two_stage(
        jax.random.PRNGKey(0), G, D, bank, measured, cfg,
        stage1_iters=2, stage2_iters=2, stage3_iters=2,
    )
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["res_loss"]))


def test_transpose_generator_forward():
    G = TransposeGenerator(n_out=64, latent_dim=1)
    k = jax.random.PRNGKey(0)
    z = jax.random.uniform(k, (2, 1), minval=-5.0, maxval=5.0)
    v = G.init({"params": k}, z, train=False)
    out = G.apply(v, z, train=False)
    assert out.shape == (2, 64, 1)


# ------------------------------------------------------------------- MDC
def test_mdc_sine_gaussian_set(tmp_path):
    from gennet_tpu.data.waveform_txt import make_sine_gaussian_mdc, save_mdc_npz

    h, pars = make_sine_gaussian_mdc(jax.random.PRNGKey(0), 4, fs=2048, duration=0.5)
    h = np.asarray(h)
    assert h.shape == (4, 1024)
    f0 = np.asarray(pars["f0"])
    assert (f0 >= 100).all() and (f0 <= 200).all()
    # hrss check: sum(h²)/fs ≈ hrss² (in scaled units: ×1e42)
    hrss2 = (h**2).sum(axis=1) / 2048
    np.testing.assert_allclose(hrss2, (1e-22 * 1e21) ** 2, rtol=0.05)
    save_mdc_npz(str(tmp_path / "mdc.npz"), h, pars)
    data = np.load(tmp_path / "mdc.npz")
    assert data["waveforms"].shape == (4, 1024)


def test_load_txt_waveforms(tmp_path):
    from gennet_tpu.data.waveform_txt import load_txt_waveforms

    t = np.linspace(0, 1, 700)
    for i in range(3):
        np.savetxt(tmp_path / f"wf{i}.txt", np.stack([t, np.sin(40 * t + i)], -1))
    out = load_txt_waveforms(str(tmp_path / "wf*.txt"), n_out=512)
    assert out.shape == (3, 512)
    assert np.abs(out).max() <= 1.0 + 1e-6


# ------------------------------------------------- denoiser/AE ablations
@pytest.mark.slow
def test_autoencoder_latent():
    from gennet_tpu.train.denoise_variants import SignalAutoencoder, train_autoencoder
    from gennet_tpu.physics.toys import sample_sinusoids
    import jax

    x = sample_sinusoids(jax.random.PRNGKey(0), 128)
    ae = SignalAutoencoder(n_out=50, encoding_dim=10)
    variables, loss = train_autoencoder(jax.random.PRNGKey(1), ae, x, epochs=30)
    assert np.isfinite(loss)
    z = ae.encode(variables, x[:4])
    assert z.shape == (4, 10)
    recon, _ = ae.apply(variables, x[:4])
    assert recon.shape == (4, 50)


@pytest.mark.slow
def test_stark_denoiser_gan():
    from gennet_tpu.train.denoise_variants import (
        DenoiserGANConfig,
        DenoiserGenerator,
        init_denoiser_gan,
        make_denoiser_gan_step,
    )
    from gennet_tpu.models import SoftmaxDiscriminator
    from gennet_tpu.physics.toys import sample_sinusoids
    import jax

    cfg = DenoiserGANConfig(n_out=50, batch_size=16)
    G, D = DenoiserGenerator(n_out=50), SoftmaxDiscriminator()
    state = init_denoiser_gan(jax.random.PRNGKey(0), G, D, cfg)
    x = sample_sinusoids(jax.random.PRNGKey(1), 16)
    step = make_denoiser_gan_step(G, D, cfg)
    for i in range(3):
        state, m = step(state, x, jax.random.PRNGKey(2 + i))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))


def test_sample_extrinsic_ranges():
    from gennet_tpu.physics.priors import sample_extrinsic
    import jax

    ext = sample_extrinsic(jax.random.PRNGKey(0), 512)
    for k, lo, hi in (("iota", 0, np.pi), ("psi", 0, 2 * np.pi),
                      ("phi", 0, 2 * np.pi), ("ra", 0, 2 * np.pi),
                      ("dec", -np.pi / 2, np.pi / 2)):
        v = np.asarray(ext[k])
        assert v.min() >= lo - 1e-6 and v.max() <= hi + 1e-6, k
    # isotropy: cos(iota) and sin(dec) uniform → means ~0
    assert abs(np.cos(np.asarray(ext["iota"])).mean()) < 0.1
    assert abs(np.sin(np.asarray(ext["dec"])).mean()) < 0.1


def test_load_image_dir_fixtures():
    """tests/data/images fixtures load through the directory-image path
    (ref loader semantics: greyscale, resize, [-1,1] rescale, flip copies,
    ganymede.py:272-314)."""
    import os

    from gennet_tpu.data.images import load_image_dir

    pat = os.path.join(os.path.dirname(__file__), "data", "images", "*.jpg")
    imgs = load_image_dir(pat, n_pix=24, flip=True)
    assert imgs.shape == (32, 24, 24, 1)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    # flipped copy follows each original
    np.testing.assert_allclose(imgs[1], imgs[0][:, ::-1], atol=1e-6)

    no_flip = load_image_dir(pat, n_pix=24, flip=False, limit=5)
    assert no_flip.shape == (5, 24, 24, 1)

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        load_image_dir("/nonexistent/*.jpg")


def test_load_mnist_idx_roundtrip(tmp_path):
    """IDX3 reader on a fabricated MNIST-format file (plain + gzip)."""
    import gzip
    import struct

    from gennet_tpu.data.images import load_mnist_idx

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (7, 28, 28), dtype=np.uint8)
    payload = struct.pack(">IIII", 0x803, 7, 28, 28) + imgs.tobytes()
    p = tmp_path / "train-images-idx3-ubyte"
    p.write_bytes(payload)
    out = load_mnist_idx(str(p))
    assert out.shape == (7, 28, 28, 1)
    np.testing.assert_allclose(out[..., 0], imgs / 127.5 - 1.0, atol=1e-6)

    pgz = tmp_path / "train-images-idx3-ubyte.gz"
    with gzip.open(pgz, "wb") as fh:
        fh.write(payload)
    out2 = load_mnist_idx(str(pgz), n_pix=14, limit=3)
    assert out2.shape == (3, 14, 14, 1)

    import pytest as _pytest

    bad = tmp_path / "bad"
    bad.write_bytes(struct.pack(">IIII", 0x1234, 1, 2, 2) + b"\x00" * 4)
    with _pytest.raises(ValueError):
        load_mnist_idx(str(bad))
