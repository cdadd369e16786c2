"""Candidate-library selection study on finished burst runs (truth-free).

Applies the production rule under test to each finished mlrc_sel run:
build a candidate library from the saved per-eval clouds —
  argmax   the in-run ELBO argmax cloud (current selector; baseline)
  plateau  plateau_pool over the per-cloud ELBOs (δ=0.1 nats)
  pool     ALL saved clouds pooled (coverage proposal)
  pool_is  pooled proposal → smoothed likelihood resample
  plat_is  plateau pool → smoothed likelihood resample
— then let elbo_score pick among them (exactly what the workload will do).
Reports every candidate's ELBO + exact-grid overlap, the chosen candidate,
and its overlap. Development protocol: the rule is fixed here and validated
unchanged on seeds 1/2.

Usage: python scripts/burst_pool_study.py out/sweeps/mlrc_sel_s0 ...
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from dataclasses import replace

from gennet_tpu.cli.workloads import BurstSmokeConfig
from gennet_tpu.eval import grid_posterior as gp
from gennet_tpu.eval import posterior_post as pp
from gennet_tpu.physics.burst import sine_gaussian


def study(out_dir, cfg):
    key = jax.random.PRNGKey(cfg.seed)
    k_bank, k_event, k_noise, key = jax.random.split(key, 4)
    signal = sine_gaussian(0.5, 1.0 / 25.0, N=cfg.n_pix)
    measured = signal + cfg.n_sig * jax.random.normal(k_noise, signal.shape)
    L, gx, gy = gp.burst_grid_posterior(measured, cfg.n_sig, cfg.pe_grain)
    L = np.asarray(L)
    synth = lambda s: sine_gaussian(s[:, 0], s[:, 1], N=cfg.n_pix)

    clouds = {}
    for p in sorted(glob.glob(os.path.join(
            out_dir, "GAN_posterior_samples", "posterior_samples_*.npz"))):
        step = int(p.rsplit("_", 1)[1].split(".")[0])
        s = np.load(p)["samples"].astype(np.float64)
        if s[:, 0].var() > 0 and s[:, 1].var() > 0:
            clouds[step] = s
    if not clouds:
        print(f"{out_dir}: no scoreable clouds")
        return None

    # THE production selector (posterior_post.select_final_cloud), so this
    # study validates the exact shipped rule; overlap is computed per
    # candidate afterwards for the report only
    ksel = jax.random.PRNGKey(cfg.seed + 7)
    chosen_name, chosen_cloud, info = pp.select_final_cloud(
        clouds, synth, measured, cfg.n_sig, ksel,
        bounds=((0.25, 0.75), (1.0 / 60.0, 1.0 / 15.0)))
    # rebuild the candidate library for the per-candidate overlap table
    per = {s: pp.elbo_score(c, synth, measured, cfg.n_sig)
           for s, c in clouds.items()}
    plat, members = pp.plateau_pool(clouds, per, delta=0.1)
    pool = np.concatenate(list(clouds.values()), axis=0)
    rows = {}
    for name, c in (("argmax", clouds[info["argmax_step"]]),
                    ("plateau", plat), ("pool", pool)):
        ov = float(gp.grid_overlap_score(c, L, gx, gy))
        rows[name] = {"elbo": round(float(info["scores"][name]), 2)
                      if name in info["scores"] else None,
                      "overlap": round(ov, 4), "n": int(c.shape[0])}
        print(f"  {name:8s} elbo={info['scores'].get(name)} overlap={ov:.4f}")
    ov_chosen = float(gp.grid_overlap_score(chosen_cloud, L, gx, gy))
    print(f"  scores: " + ", ".join(f"{k}: {v:.1f}"
                                    for k, v in info["scores"].items()))
    out = {"run": out_dir, "argmax_step": info["argmax_step"],
           "plateau_k": len(info["plateau_members"]),
           "pool_ess": round(info["pool_ess"], 1),
           "kde_ess": round(info.get("kde_ess", 0.0), 1),
           "scores": {k: round(v, 2) for k, v in info["scores"].items()},
           "candidates": rows, "chosen": chosen_name,
           "chosen_overlap": round(ov_chosen, 4)}
    chosen = chosen_name
    rows[chosen] = {"overlap": round(ov_chosen, 4)}
    print(f"  -> chosen {chosen} overlap {ov_chosen:.4f} "
          f"(pool ESS {info['pool_ess']:.0f}, KDE-IS ESS "
          f"{info.get('kde_ess', 0.0):.0f})")
    with open("out/sweeps/pool_study.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    return out


def main():
    base = BurstSmokeConfig(plots=False)
    finals = []
    for out_dir in sys.argv[1:]:
        seed = int(out_dir.rstrip("/").rsplit("_s", 1)[1])
        print(f"=== {out_dir} (seed {seed}) ===")
        r = study(out_dir, replace(base, seed=seed, out_dir=out_dir))
        if r:
            finals.append(r["chosen_overlap"])
    if finals:
        print(f"\nchosen-overlap median over {len(finals)} seeds: "
              f"{float(np.median(finals)):.4f}  (all: {finals})")


if __name__ == "__main__":
    main()
