#!/bin/bash
# Idempotent round-5 chip pipeline. Safe to re-run after a VM restart:
# every stage is orbax-resumable and stage completion is judged from
# artifacts on disk, not from in-memory state.
#
#   1. r5_tw500 twin-fix screen (25k) if its results row is absent
#   2. twin_cue_probe on the screen state
#   3. pick the flagship variant (twin_boost joins the recipe iff the
#      screen's LATE raw beta improves on the r4flag control's 0.066)
#      unless /tmp/flagship_variant pins it
#   4. 500k flagship under scripts/supervise.py (pid -> /tmp/bbh.pid)
#   5. scripts/tpu_queue.sh drains the remaining work items
#
# Usage: nohup bash scripts/r5_pipeline.sh > out/pipeline.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p out

if ! grep -q '"variant": "r5_tw500"' out/bbh_sweeps/results.jsonl 2>/dev/null; then
  if ! ps aux | grep -a "bbh_sweep.py r5_tw500" | grep -qv grep; then
    echo "[pipeline] running r5_tw500 screen" >&2
    python -m gennet_tpu.runtime.health 3600
    timeout 4500 python scripts/bbh_sweep.py r5_tw500 0 25000 \
      >> out/r5_tw500.log 2>&1
  else
    echo "[pipeline] r5_tw500 screen already running; waiting" >&2
    while ps aux | grep -a "bbh_sweep.py r5_tw500" | grep -qv grep; do
      sleep 30
    done
  fi
fi

if [ ! -f out/twin_cue_after.log ]; then
  timeout 1200 python scripts/twin_cue_probe.py out/bbh_sweeps/r5_tw500_s0 \
    > out/twin_cue_after.log 2>&1 || true
fi

if [ ! -f /tmp/flagship_variant ]; then
  python - <<'EOF'
import json
rows = [json.loads(l) for l in open("out/bbh_sweeps/results.jsonl")]
tw = [r for r in rows if r["variant"] == "r5_tw500"]
# decision rule: the twin fix joins the 500k recipe iff its 25k screen's
# final raw beta beats the r4flag control's measured final (0.066 at 50k,
# peak 0.105 at 25k) — i.e. the anti-truth cue removal shows up in the raw
# cloud, not just in D logits.
pick = "r5_tw500" if (tw and (tw[-1].get("beta_raw") or 0) > 0.11) else "r4flag"
open("/tmp/flagship_variant", "w").write(pick)
print("[pipeline] flagship variant:", pick)
EOF
fi

if ! kill -0 "$(cat /tmp/bbh.pid 2>/dev/null)" 2>/dev/null; then
  echo "[pipeline] launching 500k flagship ($(cat /tmp/flagship_variant))" >&2
  nohup python scripts/supervise.py out/bbh_r5/bbh_metrics.jsonl 1200 -- \
    python scripts/run_flagship.py > out/flagship.log 2>&1 &
  echo $! > /tmp/bbh.pid
fi

if ! ps aux | grep -a "tpu_queue.sh" | grep -v grep | grep -qv $$; then
  nohup bash scripts/tpu_queue.sh > out/queue.log 2>&1 &
  echo "[pipeline] queue started" >&2
fi
echo "[pipeline] all stages launched" >&2
