"""The 500k reference-schedule flagship run (VERDICT r4 #1).

The reference's deliverable is the 500k-iteration GAN loop
(ref: bbhMahoGANy.py:88,1241-1382). This launches the r4 flagship recipe
(r4flag in scripts/bbh_sweep.py: ch1-only D + GroupNorm G + spectral
residual at the event norm + mlrc/reweight + 4-snapshot pooling + ELBO
state selection + 10% terminal anneal) at the full 500k schedule, with:

- eval cadence thinned to 10k (50 eval points — the 5k sweep cadence would
  double the eval overhead on a 10x schedule for no extra information),
- checkpoints every 10k so a VM restart loses at most ~2 min of chip time
  (the axon host restarted twice this round; everything must be resumable),
- resume=True unconditionally: orbax restore returns None on an empty dir,
  so the same command is both "start" and "continue" — the supervisor and
  any fresh builder session can just re-run it.

Optional argv[1] selects the variant (default from /tmp/flagship_variant
if present, else r4flag): the r5_tw500 screen decides whether the
event-twin fix (twin_boost=500) joins the flagship recipe.

Usage: python scripts/run_flagship.py [VARIANT] [GAN_ITERS]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bbh_sweep import BASE, VARIANTS
from gennet_tpu.cli.workloads import run_bbh


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else ""
    if not variant:
        try:
            variant = open("/tmp/flagship_variant").read().strip()
        except OSError:
            variant = "r4flag"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    overrides = dict(VARIANTS[variant])
    overrides.update(
        seed=0, gan_iters=iters, eval_cadence=10_000, ckpt_every=10_000,
        plots=True, out_dir="out/bbh_r5", resume=True,
    )
    cfg = replace(BASE, **overrides)
    t0 = time.time()
    out = run_bbh(cfg)
    row = {
        "variant": f"{variant}_flagship", "seed": 0, "iters": iters,
        "beta": out.get("beta"), "beta_raw": out.get("beta_raw"),
        "grid_overlap_raw": out.get("grid_overlap_raw"),
        "beta_sanity": out.get("beta_sanity"),
        "cnn_sanity_beta": out.get("cnn_sanity_beta"),
        "grid_overlap": out.get("grid_overlap"),
        "whiteness": (out.get("whiteness") or {}).get("overall"),
        "frozen_at": out.get("frozen_at"),
        "selected_at": out.get("selected_at"),
        "out_dir": "out/bbh_r5",
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs("out/bbh_sweeps", exist_ok=True)
    with open("out/bbh_sweeps/results.jsonl", "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print("FLAGSHIP RESULT:", json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
