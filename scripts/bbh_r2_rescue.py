"""Rescue the r2 flagship 500k run's failed posterior, offline and truth-free.

The r2 500k run (out/bbh_r2) ended at β 0.074 — the round-2 VERDICT's top
quality gap. Its full cloud history (100 eval-cadence npz snapshots) and
CNN checkpoint are on disk, and the r3 calibration stack is eval-time only,
so the rescue needs no retraining: restore the run's own CNN (legacy
checkpoint layout — ema field grafted fresh, inference uses raw params),
rebuild the exact synthetic event/grid (same seed-0 data path), then

1. auto-select the calibration route for the FINAL cloud
   (posterior_post.select_route — the truth-free ELBO argmax), and
2. sweep a subsample of the cloud history with per-state ELBO to show what
   ELBO state selection (select_best='elbo') would have chosen live.

Scores print as β vs the lalinf-style reference cloud + exact-grid overlap.
Run on CPU (JAX_PLATFORMS=cpu) or TPU. Ref context: the reference's answer
to a sick final state was manual reruns (bbhMahoGANy.py's human workflow).
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # sitecustomize pins the axon platform before env vars are read
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from gennet_tpu.cli.workloads import BBHConfig, _prepare_bbh_data, effective_n_sig
from gennet_tpu.data import template_bank as tb
from gennet_tpu.eval import grid_posterior as gp
from gennet_tpu.eval import overlap as ov
from gennet_tpu.eval import posterior_post as pp
from gennet_tpu.models import CombinedPE, DualBranchPE
from gennet_tpu.train import CNNConfig, init_cnn
from gennet_tpu.train.checkpoints import CheckpointManager
from gennet_tpu.train.cnn import predict as cnn_predict
from gennet_tpu.physics import priors


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "out/bbh_r2"
    cfg_path = os.path.join(out_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            saved = json.load(f)
        known = {k: v for k, v in saved.items()
                 if k in BBHConfig.__dataclass_fields__}
        cfg = BBHConfig(**{**known, "out_dir": out_dir})
    else:
        # r2-era flagship configuration (predates config.json persistence):
        # reference defaults — batch 8 PE, no EMA/decay, seed 0
        cfg = BBHConfig(pe_batch_size=8, pe_ema_decay=0.0, pe_lr_decay=False,
                        out_dir=out_dir)
    key = jax.random.PRNGKey(cfg.seed)
    (_, _, signal, measured, norm, psd, truth,
     lalinf_samples, key) = _prepare_bbh_data(cfg, key, skip_bank=True)
    bank_cfg = tb.BankConfig()
    sigma_eff = float(np.std(np.asarray(measured) - np.asarray(signal)))
    Lg, gmc, gq = gp.bbh_grid_posterior(measured, psd, bank_cfg, norm,
                                        sigma_eff, grain=cfg.grid_grain)
    grid = (np.asarray(Lg), gmc, gq)
    ref_samples = gp.sample_grid_posterior(*grid, 3907, seed=cfg.seed)

    pe_cfg = CNNConfig(n_pix=cfg.n_pix, batch_size=cfg.pe_batch_size,
                       lr=cfg.lr, noise_frac=cfg.cnn_noise_frac,
                       ema_decay=cfg.pe_ema_decay,
                       lr_decay_steps=(cfg.pe_iters if cfg.pe_lr_decay
                                       else 0))
    pe_model = CombinedPE() if cfg.comb_pe_model else DualBranchPE()
    pe_state = init_cnn(jax.random.PRNGKey(cfg.seed + 1), pe_model, pe_cfg)
    restored, _ = CheckpointManager(os.path.join(out_dir, "ckpt_pe"),
                                    max_to_keep=1).restore(pe_state)
    if restored is None:
        sys.exit(f"no CNN checkpoint under {out_dir}/ckpt_pe")
    pe_state = restored
    pe_use_ema = cfg.pe_ema_decay > 0

    def synth(sm):
        sm = jnp.asarray(sm)
        mc = jnp.clip(sm[:, 0], 5.0, 60.0)
        q = jnp.clip(sm[:, 1], 0.2, 1.0)
        m1s, m2s = priors.mc_q_to_m1m2(mc, q)
        return tb.make_templates_from_params(m1s, m2s, psd, bank_cfg, norm)

    cnn = lambda w: cnn_predict(pe_model, pe_state, w, use_ema=pe_use_ema)

    def score(s):
        # non-finite clouds (a NaN-poisoned eval snapshot) and degenerate
        # clouds score 0, not NaN — NaN would survive the var<=0 guard
        # (NaN comparisons are False) and emit invalid JSON
        if not np.isfinite(s).all() or s[:, 0].var() <= 0 or s[:, 1].var() <= 0:
            return 0.0, 0.0
        return (ov.beta_overlap(s, ref_samples),
                gp.grid_overlap_score(s, *grid))

    npzs = sorted(glob.glob(os.path.join(
        out_dir, "GAN_posterior_samples", "posterior_samples_*.npz")),
        key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    if not npzs:
        sys.exit(f"no saved clouds under {out_dir}")

    rows = []
    # 1. rescue the FINAL cloud with automatic route selection
    final = np.load(npzs[-1])["samples"].astype(np.float64)
    b0, g0 = score(final)
    key, ks = jax.random.split(key)
    route, out_cloud, elbos = pp.select_route(final, synth, cnn, measured,
                                              effective_n_sig(cfg, norm), ks, temper=1.0)
    b1, g1 = score(out_cloud)
    row = {"cloud": os.path.basename(npzs[-1]), "raw_beta": round(float(b0), 4),
           "raw_grid": round(float(g0), 4), "auto_route": route,
           "auto_beta": round(float(b1), 4), "auto_grid": round(float(g1), 4),
           "elbo": {k: (round(v, 2) if np.isfinite(v) else None)
                    for k, v in elbos.items()}}
    print("RESCUE:", json.dumps(row), flush=True)
    rows.append(row)

    # 2. what would live ELBO state selection have picked? Subsample the
    # history, auto-route each state's cloud, rank by ELBO.
    picks = npzs[:: max(1, len(npzs) // 10)]
    hist = []
    for p in picks:
        c = np.load(p)["samples"].astype(np.float64)
        key, ks = jax.random.split(key)
        r, oc, es = pp.select_route(c, synth, cnn, measured, effective_n_sig(cfg, norm), ks,
                                    temper=1.0)
        b, g = score(oc)
        e = es[r]
        hist.append({"cloud": os.path.basename(p), "route": r,
                     "beta": round(float(b), 4), "grid": round(float(g), 4),
                     "elbo": round(float(e), 2) if np.isfinite(e) else None})
        print("STATE:", json.dumps(hist[-1]), flush=True)
    sel = max([h for h in hist if h["elbo"] is not None],
              key=lambda h: h["elbo"], default=None)
    print("SELECTED:", json.dumps(sel), flush=True)

    os.makedirs("out/bbh_sweeps", exist_ok=True)
    with open("out/bbh_sweeps/r2_rescue.jsonl", "a") as fh:
        for r in rows + hist:
            fh.write(json.dumps(r) + "\n")
        fh.write(json.dumps({"selected": sel}) + "\n")


if __name__ == "__main__":
    main()
