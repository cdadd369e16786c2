"""Measure truth-free posterior STACKING over the ELBO plateau.

The r5 flagship showed Spearman(ELBO, beta) = 0.67 across its 50 evals,
but the top-5 ELBO states sit within 0.02 nats of each other while their
beta spans 0.80-0.91: argmax-ELBO selection inside that plateau is
effectively a coin flip (it picked 320k -> 0.8975 while 280k scored
0.9426). The obvious truth-free fix is to POOL the clouds of the top-K
ELBO evals instead of betting on one: pooling averages the oscillation
of the GAN state across training, and K is chosen by ELBO itself (the
pooled cloud is rescored; report every K so the ELBO-argmax row is the
honest headline).

Selection stays truth-free: clouds are ranked by their logged in-run
ELBO; beta / grid overlap are computed only AFTER selection, for
reporting. Ref context: the reference keeps a per-cadence posterior
pickle history (bbhMahoGANy.py:1379-1381) but always reports the latest
cloud; cross-snapshot stacking is a beyond-reference lever on the same
artifact.

Usage: python scripts/elbo_stack_eval.py OUT_DIR [K ...]
       (default K sweep: 1 2 3 4 5 8 12 50)
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
import numpy as np

from gennet_tpu.cli.workloads import BBHConfig, _bbh_bank_cfg, _prepare_bbh_data
from gennet_tpu.eval import grid_posterior as gp
from gennet_tpu.eval import overlap as ov
from gennet_tpu.eval import posterior_post as pp


def load_run(out_dir):
    with open(os.path.join(out_dir, "config.json")) as f:
        saved = json.load(f)
    known = {k: v for k, v in saved.items()
             if k in BBHConfig.__dataclass_fields__}
    return BBHConfig(**{**known, "out_dir": out_dir})


def main():
    out_dir = sys.argv[1]
    ks = [int(a) for a in sys.argv[2:]] or [1, 2, 3, 4, 5, 8, 12, 50]
    cfg = load_run(out_dir)

    # per-eval ELBO from the run's own log (truth-free, logged in-run)
    elbo_by_step = {}
    with open(os.path.join(out_dir, "bbh_metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("elbo") is not None:
                elbo_by_step[int(r["step"])] = float(r["elbo"])

    clouds = {}
    for p in glob.glob(os.path.join(out_dir, "GAN_posterior_samples",
                                    "posterior_samples_*.npz")):
        step = int(p.rsplit("_", 1)[1].split(".")[0])
        if step in elbo_by_step:
            clouds[step] = np.load(p)["samples"].astype(np.float64)
    if not clouds:
        sys.exit(f"no (cloud, elbo) pairs under {out_dir}")

    # same reference construction as the run / bbh_postproc_eval
    key = jax.random.PRNGKey(cfg.seed)
    (_, _, signal, measured, norm, psd, truth, lalinf_samples,
     key) = _prepare_bbh_data(cfg, key, skip_bank=True)
    bank_cfg = _bbh_bank_cfg(cfg)
    sigma_eff = float(np.std(np.asarray(measured) - np.asarray(signal)))
    Lg, gmc, gq = gp.bbh_grid_posterior(measured, psd, bank_cfg, norm,
                                        sigma_eff, grain=cfg.grid_grain)
    grid = (np.asarray(Lg), gmc, gq)
    ref_samples = (lalinf_samples if lalinf_samples is not None
                   else gp.sample_grid_posterior(Lg, gmc, gq, 3907,
                                                 seed=cfg.seed))

    def synth(sm):
        import jax.numpy as jnp

        from gennet_tpu.data import template_bank as tb
        from gennet_tpu.physics import priors

        sm = jnp.asarray(sm)
        m1s, m2s = priors.mc_q_to_m1m2(jnp.clip(sm[:, 0], 5.0, 60.0),
                                       jnp.clip(sm[:, 1], 0.2, 1.0))
        return tb.make_templates_from_params(m1s, m2s, psd, bank_cfg, norm)

    from gennet_tpu.cli.workloads import effective_n_sig
    n_sig_eff = effective_n_sig(cfg, norm)

    ranked = sorted(clouds, key=lambda s: -elbo_by_step[s])
    print(f"{len(ranked)} clouds; ELBO-ranked head: "
          f"{[(s, round(elbo_by_step[s], 2)) for s in ranked[:6]]}")
    best = None
    for k in ks:
        if k > len(ranked):
            continue
        pool = np.concatenate([clouds[s] for s in ranked[:k]], axis=0)
        if len(pool) > 8000:
            # cap the scored set: beta's KDE and elbo's synth are O(n);
            # a uniform subsample of the pooled q is the same distribution
            idx = np.random.default_rng(cfg.seed).choice(
                len(pool), 8000, replace=False)
            pool = pool[idx]
        beta = (ov.beta_overlap(pool, ref_samples)
                if pool[:, 0].var() > 0 else 0.0)
        go = gp.grid_overlap_score(pool, *grid)
        # rescored ELBO of the pooled cloud: the truth-free criterion a
        # production selector would use to pick K
        e = pp.elbo_score(pool, synth, measured, n_sig_eff)
        row = {"run": os.path.basename(out_dir.rstrip("/")), "k": k,
               "steps": ranked[:k], "beta": round(float(beta), 4),
               "grid_overlap": round(float(go), 4),
               "elbo_pooled": round(float(e), 2) if np.isfinite(e) else None}
        print("STACK:", json.dumps(row), flush=True)
        with open("out/bbh_sweeps/stacking.jsonl", "a") as fh:
            fh.write(json.dumps(row) + "\n")
        if best is None or (row["elbo_pooled"] is not None
                            and row["elbo_pooled"] > best["elbo_pooled"]):
            best = row
    print("ELBO-argmax K:", json.dumps(best))


if __name__ == "__main__":
    main()
