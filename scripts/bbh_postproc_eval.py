"""Score truth-free posterior post-processing on SAVED flagship clouds.

The calibration routes (eval/posterior_post.py: self_calibrate /
bootstrap_calibrate / likelihood_resample) are eval-time transforms of the
sampled cloud — no retraining involved. This script restores a finished
run_bbh screen's final posterior npz + the shared cached CNN, rebuilds the
exact grid reference (same data path as the run), and reports β /
grid-overlap for each route, so the flagship post-processing lever is
measured on every finished state at once instead of re-training per knob.

Ref context: the reference's validation loop (bbhMahoGANy.py:811-873)
scores raw CNN(G draws) — post-processing is a beyond-reference lever for
the same β metric.

Usage: python scripts/bbh_postproc_eval.py [--library-only] OUT_DIR [...]
       (--library-only skips the per-route sweep and runs just the
        production library selection — the cheap re-selection path)
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # sitecustomize pins the axon platform before env vars are read;
    # re-apply so JAX_PLATFORMS=cpu runs actually stay on CPU
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from gennet_tpu.cli.workloads import BBHConfig, _prepare_bbh_data, effective_n_sig
from gennet_tpu.data import template_bank as tb
from gennet_tpu.eval import grid_posterior as gp
from gennet_tpu.eval import overlap as ov
from gennet_tpu.eval import posterior_post as pp
from gennet_tpu.models import CombinedPE, DualBranchPE
from gennet_tpu.physics import priors
from gennet_tpu.train import CNNConfig, init_cnn
from gennet_tpu.train.checkpoints import CheckpointManager
from gennet_tpu.train.cnn import predict as cnn_predict


def load_run(out_dir):
    cfg_path = os.path.join(out_dir, "config.json")
    with open(cfg_path) as f:
        saved = json.load(f)
    known = {k: v for k, v in saved.items()
             if k in BBHConfig.__dataclass_fields__}
    return BBHConfig(**{**known, "out_dir": out_dir})


def main():
    args = sys.argv[1:]
    library_only = "--library-only" in args
    out_dirs = [a for a in args if a != "--library-only"]
    ctx_cache = {}
    for out_dir in out_dirs:
        cfg = load_run(out_dir)
        # data/grid/PE depend only on these fields — share across variants
        ctx_key = (cfg.seed, cfg.n_pix, cfg.training_num, cfg.pe_iters,
                   cfg.pe_batch_size, cfg.lr, cfg.cnn_noise_frac,
                   cfg.pe_ema_decay, cfg.pe_lr_decay, cfg.comb_pe_model,
                   cfg.grid_grain)
        if ctx_key not in ctx_cache:
            key = jax.random.PRNGKey(cfg.seed)
            (_, _, signal, measured, norm, psd, truth,
             lalinf_samples, key) = _prepare_bbh_data(cfg, key,
                                                      skip_bank=True)
            bank_cfg = tb.BankConfig()
            sigma_eff = float(np.std(np.asarray(measured) - np.asarray(signal)))
            Lg, gmc, gq = gp.bbh_grid_posterior(measured, psd, bank_cfg,
                                                norm, sigma_eff,
                                                grain=cfg.grid_grain)
            ref_samples = gp.sample_grid_posterior(Lg, gmc, gq, 3907,
                                                   seed=cfg.seed)
            pe_cfg = CNNConfig(n_pix=cfg.n_pix, batch_size=cfg.pe_batch_size,
                               lr=cfg.lr, noise_frac=cfg.cnn_noise_frac,
                               ema_decay=cfg.pe_ema_decay,
                               lr_decay_steps=(cfg.pe_iters if cfg.pe_lr_decay
                                               else 0))
            pe_model = CombinedPE() if cfg.comb_pe_model else DualBranchPE()
            pe_state = init_cnn(jax.random.PRNGKey(cfg.seed + 1), pe_model,
                                pe_cfg)
            tag = (f"s{cfg.seed}_i{cfg.pe_iters}_n{cfg.n_pix}"
                   f"_b{cfg.pe_batch_size}_lr{cfg.lr:g}"
                   f"_nf{cfg.cnn_noise_frac:g}_tn{cfg.training_num}"
                   f"_ema{cfg.pe_ema_decay:g}_lrd{int(cfg.pe_lr_decay)}"
                   f"_cmb{int(cfg.comb_pe_model)}")
            restored, _ = CheckpointManager(
                os.path.join(cfg.cnn_cache, tag), max_to_keep=1
            ).restore(pe_state)
            if restored is None:
                sys.exit(f"no cached CNN for {out_dir} (tag {tag})")
            pe_state = restored
            ctx_cache[ctx_key] = (pe_model, pe_state, measured, psd, norm,
                                  bank_cfg, (np.asarray(Lg), gmc, gq),
                                  ref_samples)
        (pe_model, pe_state, measured, psd, norm, bank_cfg, grid,
         ref_samples) = ctx_cache[ctx_key]
        pe_use_ema = cfg.pe_ema_decay > 0

        npzs = sorted(glob.glob(os.path.join(
            out_dir, "GAN_posterior_samples", "posterior_samples_*.npz")),
            key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
        if not npzs:
            print(f"SKIP {out_dir}: no saved clouds")
            continue
        cloud = np.load(npzs[-1])["samples"].astype(np.float64)

        def synth(sm):
            sm = jnp.asarray(sm)
            m1s, m2s = priors.mc_q_to_m1m2(sm[:, 0], sm[:, 1])
            return tb.make_templates_from_params(m1s, m2s, psd, bank_cfg,
                                                 norm)

        cnn = lambda w: cnn_predict(pe_model, pe_state, w, use_ema=pe_use_ema)
        key = jax.random.PRNGKey(cfg.seed + 77)

        def score(s):
            return (ov.beta_overlap(s, ref_samples)
                    if s[:, 0].var() > 0 else 0.0,
                    gp.grid_overlap_score(s, *grid))

        routes = {}
        if not library_only:
            routes["raw"] = cloud
            k1, k2, k3, k4, key = jax.random.split(key, 5)
            routes["debias1"] = pp.self_calibrate(cloud, synth, cnn, k1,
                                                  effective_n_sig(cfg, norm), rounds=1)
            routes["debias2"] = pp.self_calibrate(cloud, synth, cnn, k2,
                                                  effective_n_sig(cfg, norm), rounds=2)
            routes["bootcal"] = pp.bootstrap_calibrate(cloud, synth, cnn, k3,
                                                       effective_n_sig(cfg, norm))
            routes["debias1_bootcal"] = pp.bootstrap_calibrate(
                routes["debias1"], synth, cnn, k4, effective_n_sig(cfg, norm))
            km, kmr, key = jax.random.split(key, 3)
            routes["mlrc"] = pp.ml_recenter(cloud, synth, measured, km)
            routes["mlrc_reweight1"] = pp.likelihood_resample(
                routes["mlrc"], synth, measured, effective_n_sig(cfg, norm), kmr, temper=1.0)
            kr, kr5, key = jax.random.split(key, 3)
            routes["reweight1"] = pp.likelihood_resample(
                cloud, synth, measured, effective_n_sig(cfg, norm), kr, temper=1.0)
            routes["reweight05"] = pp.likelihood_resample(
                cloud, synth, measured, effective_n_sig(cfg, norm), kr5, temper=0.5)
            ess = {t: round(pp.effective_sample_size(cloud, synth, measured,
                                                     effective_n_sig(cfg, norm), temper=t), 1)
                   for t in (1.0, 0.5)}

        for name, s in routes.items():
            b, g = score(np.asarray(s))
            # truth-free selector score alongside the truth metrics: the
            # (elbo, grid_overlap) pairs across runs/routes validate that
            # argmax-ELBO selection picks high-overlap clouds on the
            # flagship, not just in the Gaussian unit test
            e = pp.elbo_score(np.asarray(s), synth, measured, effective_n_sig(cfg, norm))
            row = {"run": os.path.basename(out_dir.rstrip("/")),
                   "route": name, "beta": round(float(b), 4),
                   "grid_overlap": round(float(g), 4),
                   "elbo": round(float(e), 2) if np.isfinite(e) else None,
                   "cloud": npzs[-1].rsplit("/", 1)[1]}
            if name.startswith("reweight"):
                row["ess"] = ess[1.0 if name == "reweight1" else 0.5]
            print("POSTPROC:", json.dumps(row), flush=True)
            with open("out/bbh_sweeps/postproc.jsonl", "a") as fh:
                fh.write(json.dumps(row) + "\n")

        # library selection (the r5 production rule, posterior_post.
        # select_final_cloud): candidate clouds built from ALL saved
        # per-eval clouds — plateau pool, full pool, smoothed-IS, KDE-IS —
        # ELBO-chosen; every candidate's truth metrics logged alongside
        lib = {}
        for p in npzs:
            st = int(p.rsplit("_", 1)[1].split(".")[0])
            if st <= cfg.gan_iters:
                lib[st] = np.load(p)["samples"].astype(np.float64)
        key, ksel = jax.random.split(key)
        sel_name, chosen, info = pp.select_final_cloud(
            lib, synth, measured, effective_n_sig(cfg, norm), ksel,
            bounds=((20.0, 35.0), (0.5, 1.0)))
        if chosen is not None:
            for cname, ccloud in info["candidates"].items():
                b, g = score(np.asarray(ccloud))
                e = info["scores"][cname]
                row = {"run": os.path.basename(out_dir.rstrip("/")),
                       "route": f"library:{cname}",
                       "beta": round(float(b), 4),
                       "grid_overlap": round(float(g), 4),
                       "elbo": round(float(e), 2) if np.isfinite(e) else None,
                       "chosen": cname == sel_name,
                       "plateau_k": len(info["plateau_members"]),
                       "pool_ess": round(info["pool_ess"], 1),
                       "kde_ess": round(info.get("kde_ess", 0.0), 1)}
                se = info.get("score_ses", {}).get(cname)
                if se is not None and np.isfinite(se):
                    row["elbo_se"] = round(float(se), 3)
                if cname == sel_name and "tiebreak" in info:
                    row["tiebreak"] = {k: round(v, 4) if isinstance(v, float)
                                       else v
                                       for k, v in info["tiebreak"].items()}
                print("POSTPROC:", json.dumps(row), flush=True)
                with open("out/bbh_sweeps/postproc.jsonl", "a") as fh:
                    fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
