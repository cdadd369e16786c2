#!/bin/bash
# One-chip work queue: wait for the flagship supervisor (pid in
# /tmp/bbh.pid) to finish, then run work items from scripts/tpu_queue.txt
# (one shell command per line; '#' comments). The list file is re-read
# between items, so priorities can be edited while the queue runs —
# completed items are recorded in /tmp/queue_done.txt and skipped.
# Each item is bounded (tunnel wedges hang silently) and retried once
# after a device-health wait; failures move on so one sick item cannot
# starve the rest. Usage: nohup bash scripts/tpu_queue.sh &
set -u
cd "$(dirname "$0")/.."
DONE=/tmp/queue_done.txt
touch "$DONE"

# ONE chip: wait while the flagship supervisor (pid file) is alive OR any
# train-bbh process is visible — a missing/stale pid file alone must not
# start the queue next to a live training run.
flagship_busy() {
  kill -0 "$(cat /tmp/bbh.pid 2>/dev/null)" 2>/dev/null && return 0
  ps aux | grep -a "cli.main train-bbh" | grep -qv grep
}
while flagship_busy; do
  sleep 60
done
echo "[queue] flagship done; draining scripts/tpu_queue.txt" >&2

health_wait() {
  python -m gennet_tpu.runtime.health 3600
}

while true; do
  item=$(grep -v '^\s*#' scripts/tpu_queue.txt 2>/dev/null \
         | grep -v '^\s*$' | while IFS= read -r line; do
             grep -qxF "$line" "$DONE" || { echo "$line"; break; }
           done)
  [ -z "$item" ] && break
  for attempt in 1 2; do
    echo "[queue] attempt $attempt: $item" >&2
    health_wait
    if timeout 4500 bash -c "$item"; then
      break
    fi
    echo "[queue] attempt $attempt failed: $item" >&2
  done
  echo "$item" >> "$DONE"
done
echo "[queue] all items done" >&2
