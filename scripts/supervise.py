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


def mtime(path):
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


# sitecustomize pins the axon platform before env vars are read, so the
# probe must re-apply JAX_PLATFORMS via jax.config to honor CPU overrides.
HEALTH_SNIPPET = (
    "import os, jax;"
    "p = os.environ.get('JAX_PLATFORMS');"
    "p and jax.config.update('jax_platforms', p);"
    "import jax.numpy as jnp, numpy as np;"
    "x = jnp.ones((256, 256));"
    "print(float(np.asarray((x @ x).sum())))"
)


def wait_device_healthy(max_wait=3600):
    """Block until a fresh process can run a tiny program to completion.

    After a wedge the tunnel needs a client-free cooloff (observed ~10 min);
    relaunching the real job into a sick tunnel just wedges the new attempt
    at device init and burns another stall timeout.
    """
    t0 = time.time()
    while time.time() - t0 < max_wait:
        rc = subprocess.call(
            ["timeout", "90", sys.executable, "-c", HEALTH_SNIPPET],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if rc == 0:
            print("[supervise] device healthy", flush=True)
            return True
        print("[supervise] device unhealthy; cooling off 60s", flush=True)
        time.sleep(60)
    print("[supervise] device still unhealthy after "
          f"{max_wait:.0f}s; launching anyway", flush=True)
    return False


def main():
    split = sys.argv.index("--")
    watch = sys.argv[1]
    stall = float(sys.argv[2])
    cmd = sys.argv[split + 1:]

    attempt = 0
    while True:
        attempt += 1
        wait_device_healthy()
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
