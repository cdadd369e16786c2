"""Stall-supervised runner for long TPU workloads on the axon tunnel.

The tunnel intermittently wedges a process on the first dispatch of a NEW
program right after a long scan program (observed repeatedly this round:
futex-parked process, zero progress, device fine for a FRESH process after
the stuck one is killed). Every long workload here is orbax-resumable, so
the cheapest robust fix is supervision: launch, watch the metrics file,
kill + relaunch with --resume on stall, stop when the process exits 0.

Usage:
    python scripts/supervise.py OUT_METRICS_FILE STALL_SECS -- CMD...
"""

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gennet_tpu.runtime.health import wait_device_healthy


def mtime(path):
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def _log(msg):
    print(f"[supervise] {msg.removeprefix('[health] ')}", flush=True)


def main():
    split = sys.argv.index("--")
    watch = sys.argv[1]
    stall = float(sys.argv[2])
    cmd = sys.argv[split + 1:]

    attempt = 0
    while True:
        attempt += 1
        wait_device_healthy(log=_log)
        print(f"[supervise] attempt {attempt}: {' '.join(cmd)}", flush=True)
        proc = subprocess.Popen(cmd)
        start = time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    print(f"[supervise] done (attempt {attempt})", flush=True)
                    return
                print(f"[supervise] exit {rc}; relaunching", flush=True)
                break
            age = time.time() - max(mtime(watch), start)
            if age > stall:
                print(f"[supervise] stalled {age:.0f}s; killing pid {proc.pid}",
                      flush=True)
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                break
            time.sleep(15)
        # let the device shake off the wedged session
        time.sleep(20)


if __name__ == "__main__":
    main()
