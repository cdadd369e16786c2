"""Workload-driver integration tests (tiny configs, CPU mesh)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-workload drivers: minutes each on CPU

from gennet_tpu.cli.workloads import (
    BlobToyConfig,
    BurstSmokeConfig,
    run_blob_toy,
    run_burst_smoke,
)


def test_burst_smoke_tiny(tmp_path):
    cfg = BurstSmokeConfig(
        n_pix=128, n_signals=512, gan_iters=6, pe_iters=6, cadence=5,
        batch_size=8, n_posterior=32, pe_grain=21,
        out_dir=str(tmp_path / "burst"), plots=False,
    )
    out = run_burst_smoke(cfg)
    assert np.isfinite(out["rms"]).all()
    assert 0.0 <= out["grid_overlap"] <= 1.0


def test_burst_smoke_tiny_bootstrap_anneal(tmp_path):
    """Exercise the bootstrap sampler (noise-calibrated CNN + fresh-noise
    draws) and the terminal anneal in one tiny run."""
    cfg = BurstSmokeConfig(
        n_pix=128, n_signals=512, gan_iters=6, pe_iters=6, cadence=5,
        batch_size=8, n_posterior=32, pe_grain=21,
        pe_noise_frac=0.5, posterior_noise=1.0, anneal_frac=0.5,
        res_loss_weight=10.0,
        out_dir=str(tmp_path / "burst"), plots=False,
    )
    out = run_burst_smoke(cfg)
    assert np.isfinite(out["rms"]).all()
    assert 0.0 <= out["grid_overlap"] <= 1.0


def test_burst_smoke_library_selection(tmp_path):
    """select_best='elbo' end-to-end: per-eval clouds persist, the final
    posterior comes from the candidate library (posterior_post.
    select_final_cloud), and the selection diagnostics surface in the
    summary."""
    cfg = BurstSmokeConfig(
        n_pix=128, n_signals=512, gan_iters=10, pe_iters=6, cadence=2,
        eval_every=1, batch_size=8, n_posterior=32, pe_grain=21,
        select_best="elbo",
        out_dir=str(tmp_path / "burst"), plots=False,
    )
    out = run_burst_smoke(cfg)
    assert 0.0 <= out["grid_overlap"] <= 1.0
    assert out["selected_route"] in {"final", "argmax", "plateau", "pool",
                                     "pool_is", "plat_is", "kde_is"}, out
    if out["selected_route"] != "final":
        assert out["pool_ess"] is None or out["pool_ess"] >= 0.0


def test_blob_toy_tiny(tmp_path):
    cfg = BlobToyConfig(
        n_pix=16, n_signals=256, pe_iters=6, mc_pe_iters=6, gan_iters=6,
        cadence=5, batch_size=8, n_mc_draws=16,
        out_dir=str(tmp_path / "blob"), plots=False,
    )
    out = run_blob_toy(cfg)
    assert np.isfinite(out["pe_rms"]).all()
    assert 0.0 <= out["mc_overlap"] <= 1.0
    assert np.isfinite(out["gan_d_loss"])


@pytest.mark.slowest  # ~320s CPU warm (VERDICT r4 #8: shrunk from 637s by
#                       running the full wiring at the n_pix=256 bank
#                       geometry — integration test, not a convergence test;
#                       the 1024 reference geometry is exercised by every
#                       real chip run and by bench.py)
def test_bbh_workload_tiny(tmp_path):
    # full flagship wiring with a tiny synthetic bank, trained two steps;
    # n_pix=256 derives a fs=256 BankConfig (workloads._bbh_bank_cfg)
    from gennet_tpu.cli.workloads import BBHConfig, run_bbh

    cfg = BBHConfig(
        n_pix=256, training_num=24, pe_iters=2, gan_iters=2, cadence=1,
        pe_cadence=1, eval_cadence=1, n_posterior=8, grid_grain=11,
        ckpt_every=10_000, out_dir=str(tmp_path / "bbh"), plots=False,
    )
    out = run_bbh(cfg)
    assert out["final_step"] >= 2
    # β is reported by default via the synthetic-event exact grid posterior
    assert out["beta"] is not None and 0.0 <= out["beta"] <= 1.0
    assert out["cnn_sanity_beta"] is not None


def test_image_gan_tiny(tmp_path):
    """Image-directory GAN mode over the committed fixture set (the
    reference's face-image path, ganymede.py:64,272-314)."""
    import os

    from gennet_tpu.cli.workloads import ImageGANConfig, run_image_gan

    glob_pat = os.path.join(os.path.dirname(__file__), "data", "images", "*.jpg")
    cfg = ImageGANConfig(
        image_glob=glob_pat, n_pix=16, gan_iters=6, cadence=5, batch_size=8,
        out_dir=str(tmp_path / "img"), plots=False,
    )
    out = run_image_gan(cfg)
    assert out["n_images"] == 32  # 16 fixtures x flip
    assert np.isfinite(out["gan_d_loss"]) and np.isfinite(out["gan_g_loss"])
    assert -1.0 <= out["recovery_corr"] <= 1.0


def test_freeze_on_res_requires_white_gate(tmp_path):
    """freeze_on_res is only checked inside the whiteness gate; a res-only
    config silently never fires, so it must be rejected (ADVICE r3)."""
    import pytest

    from gennet_tpu.cli.workloads import (BBHConfig, BurstSmokeConfig,
                                          run_bbh, run_burst_smoke)

    with pytest.raises(ValueError, match="freeze_on_res"):
        run_bbh(BBHConfig(freeze_on_res=1e-5, freeze_on_white=0.0,
                          out_dir=str(tmp_path / "b")))
    with pytest.raises(ValueError, match="freeze_on_res"):
        run_burst_smoke(BurstSmokeConfig(freeze_on_res=1e-5, freeze_on_white=0.0,
                                    out_dir=str(tmp_path / "s")))


def test_burst_smoke_multidevice_mesh(tmp_path):
    """VERDICT r4 #6: the PRODUCTION workload composition — not just the
    step fn — executed over the 8-device CPU mesh: DP pe/gan steps inside
    run_burst_smoke, posterior eval, checkpoint."""
    from gennet_tpu.cli.workloads import run_burst_smoke
    from gennet_tpu.train.mesh import data_mesh

    mesh = data_mesh(8)
    assert mesh.shape["data"] == 8
    cfg = BurstSmokeConfig(
        n_pix=128, n_signals=512, gan_iters=6, pe_iters=6, cadence=5,
        batch_size=8, n_posterior=32, pe_grain=21,
        out_dir=str(tmp_path / "burst_dp"), plots=False,
    )
    out = run_burst_smoke(cfg, mesh=mesh)
    assert np.isfinite(out["rms"]).all()
    assert 0.0 <= out["grid_overlap"] <= 1.0


@pytest.mark.slowest  # BBH models at the n_pix=256 test geometry over the
#                       mesh (VERDICT r4 #8; see test_bbh_workload_tiny note)
def test_bbh_workload_multidevice_mesh(tmp_path):
    """run_bbh — sharded-batch CNN + GAN steps, posterior eval, orbax
    checkpoint, β vs the exact grid — over an 8-device mesh end-to-end,
    with the twin-boost real bank (SURVEY §4 multi-node note)."""
    from gennet_tpu.cli.workloads import BBHConfig, run_bbh
    from gennet_tpu.train.mesh import data_mesh

    # DP steps shard the BANK rows over the mesh: after the twin drop the
    # real bank is training_num−1 rows, and the GAN bank adds twin_boost —
    # both must divide the 8-device mesh (25−1=24, 24+8=32)
    cfg = BBHConfig(
        n_pix=256, training_num=25, pe_iters=2, gan_iters=2, cadence=1,
        pe_cadence=1, eval_cadence=1, n_posterior=8, grid_grain=11,
        ckpt_every=10_000, twin_boost=8,
        out_dir=str(tmp_path / "bbh_dp"), plots=False,
    )
    out = run_bbh(cfg, mesh=data_mesh(8))
    assert out["final_step"] >= 2
    assert out["beta"] is not None and 0.0 <= out["beta"] <= 1.0
