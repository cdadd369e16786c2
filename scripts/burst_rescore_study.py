"""Offline truth-free re-scoring study for burst posterior selection.

Motivation (measured, r5): the mlrc_sel zero-knob runs select their final
state by in-run ELBO, but on seed 0 Spearman(ELBO, grid overlap) = -0.09
across the 18 evals — the selector picked 45k (overlap 0.60) while 22.5k
scored 0.93. This script replays every saved cloud of a finished burst run
through a battery of truth-free scores and reports each score's rank
correlation with the exact-grid overlap, plus the overlap of the
single-best and plateau-stacked cloud under each score. Development
protocol: tune nothing per-seed — whatever rule this study picks on seed 0
is validated unchanged on seeds 1/2 (their runs never saw the rule).

Scores (all truth-free: only `measured`, the forward model, and the cloud):
  elbo_g    ELBO with Gaussian entropy (the in-run selector; baseline)
  elbo_k    ELBO with k-NN entropy (nonparametric; duplicates floored)
  mlogl     E_q[logL] alone (no entropy; rewards delta-collapse, shown
            for diagnosis, never a candidate selector)
  white     posterior-MEAN residual whiteness (eval/whiteness)
  w_elbo    whiteness-gated ELBO: elbo_g where white >= 0.5, else -inf

Usage: python scripts/burst_rescore_study.py OUT_DIR [OUT_DIR ...]
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

from gennet_tpu.cli.workloads import BurstSmokeConfig
from gennet_tpu.eval import grid_posterior as gp
from gennet_tpu.eval import posterior_post as pp
from gennet_tpu.eval.whiteness import posterior_whiteness
from gennet_tpu.physics.burst import sine_gaussian


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ca, cb = ra - ra.mean(), rb - rb.mean()
    den = np.sqrt((ca**2).sum() * (cb**2).sum())
    return float((ca * cb).sum() / den) if den > 0 else 0.0


def study(out_dir, cfg):
    # event + exact grid: the same deterministic construction as
    # run_burst_smoke (workloads.py:265-277) — seed fully determines both
    key = jax.random.PRNGKey(cfg.seed)
    k_bank, k_event, k_noise, key = jax.random.split(key, 4)
    signal = sine_gaussian(0.5, 1.0 / 25.0, N=cfg.n_pix)
    measured = signal + cfg.n_sig * jax.random.normal(k_noise, signal.shape)
    L, gx, gy = gp.burst_grid_posterior(measured, cfg.n_sig, cfg.pe_grain)
    L = np.asarray(L)

    synth = lambda s: sine_gaussian(s[:, 0], s[:, 1], N=cfg.n_pix)
    meas_np = np.asarray(measured)

    clouds = {}
    for p in sorted(glob.glob(os.path.join(
            out_dir, "GAN_posterior_samples", "posterior_samples_*.npz"))):
        step = int(p.rsplit("_", 1)[1].split(".")[0])
        clouds[step] = np.load(p)["samples"].astype(np.float64)
    if not clouds:
        print(f"{out_dir}: no saved clouds"); return None

    rows = []
    for step, s in clouds.items():
        if s[:, 0].var() <= 0 or s[:, 1].var() <= 0:
            continue  # collapsed clouds are never selectable in-run either
        wf = np.asarray(synth(s))
        wmean = wf.mean(axis=0, keepdims=True)
        ws = posterior_whiteness(meas_np / cfg.n_sig, wmean / cfg.n_sig, 1.0)
        eg = pp.elbo_score(s, synth, measured, cfg.n_sig)
        ek = pp.elbo_score(s, synth, measured, cfg.n_sig, entropy="knn")
        d = meas_np[None, :] - wf
        mlogl = float(np.mean(-0.5 * np.sum(d**2, axis=1) / cfg.n_sig**2))
        go = gp.grid_overlap_score(s, L, gx, gy)
        rows.append({"step": step, "elbo_g": eg, "elbo_k": ek,
                     "mlogl": mlogl, "white": ws["overall"],
                     "w_elbo": eg if ws["overall"] >= 0.5 else float("-inf"),
                     "overlap": float(go)})
    ov = np.array([r["overlap"] for r in rows])
    print(f"\n=== {out_dir}  ({len(rows)} scoreable clouds) ===")
    print(f"{'score':8s} {'spearman':>9s} {'argmax step':>11s} "
          f"{'argmax ovl':>10s} {'stack ovl':>9s}")
    out = {"run": out_dir, "n": len(rows)}
    for name in ("elbo_g", "elbo_k", "mlogl", "white", "w_elbo"):
        v = np.array([r[name] for r in rows])
        finite = np.isfinite(v)
        if not finite.any():
            print(f"{name:8s}  (no finite scores)"); continue
        rho = spearman(v[finite], ov[finite])
        best = int(np.argmax(np.where(finite, v, -np.inf)))
        # plateau stack: pool clouds within 0.1 nats (or 0.1 score units)
        # of the max — the rule the bbh flagship stacking measured
        mx = v[best]
        # fixed additive plateau width: 0.1 nats for ELBO-scale scores
        members = [r["step"] for r, vi, f in zip(rows, v, finite)
                   if f and vi >= mx - 0.1] or [rows[best]["step"]]
        pool = np.concatenate([clouds[s] for s in members], axis=0)
        sg = gp.grid_overlap_score(pool, L, gx, gy)
        print(f"{name:8s} {rho:9.3f} {rows[best]['step']:11d} "
              f"{rows[best]['overlap']:10.4f} {float(sg):9.4f} "
              f" (stack K={len(members)})")
        out[name] = {"spearman": round(rho, 3),
                     "argmax_step": rows[best]["step"],
                     "argmax_overlap": round(rows[best]["overlap"], 4),
                     "stack_overlap": round(float(sg), 4),
                     "stack_k": len(members)}
    out["best_overlap"] = round(float(ov.max()), 4)
    out["final_overlap"] = round(float(ov[-1]), 4)
    print(f"best-in-run overlap {ov.max():.4f}; per-cloud table:")
    for r in rows:
        print(f"  {r['step']:6d} ovl={r['overlap']:.4f} "
              f"elbo_g={r['elbo_g']:8.1f} elbo_k={r['elbo_k']:8.1f} "
              f"white={r['white']:.2f} mlogl={r['mlogl']:8.1f}")
    with open("out/sweeps/rescore_study.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    return out


def main():
    base = BurstSmokeConfig(plots=False, cadence=500, eval_every=5,
                            cnn_cache="out/sweeps/cnn_cache")
    for out_dir in sys.argv[1:]:
        seed = int(out_dir.rstrip("/").rsplit("_s", 1)[1])
        from dataclasses import replace
        study(out_dir, replace(base, seed=seed, out_dir=out_dir))


if __name__ == "__main__":
    main()
