"""Device-health probing for the flaky axon tunnel.

The tunnel has two observed failure modes: a silent futex wedge (a process
hangs inside a device transfer while `jax.devices()` may still pass) and a
dead relay (no listener on the tunnel ports at all). Both are detected the
same way: a FRESH process must run a tiny matmul to completion with a
forced host transfer, under a hard timeout. Probing from a fresh process
is essential — a wedged client never recovers, and the probing process
must not itself become a stuck client holding the tunnel.

Shared by bench.py, scripts/supervise.py, and scripts/tpu_queue.sh
(`python -m gennet_tpu.runtime.health`) so probe semantics cannot drift.
"""

import subprocess
import sys
import time

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


def probe_once(timeout_s: int = 90) -> bool:
    """One fresh-process probe; True = a tiny program ran to completion."""
    rc = subprocess.call(
        ["timeout", str(timeout_s), sys.executable, "-c", HEALTH_SNIPPET],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return rc == 0


def wait_device_healthy(max_wait: float = 3600, cooloff: float = 60,
                        log=print) -> bool:
    """Block until a probe passes, cooling off between failures.

    After a wedge the tunnel needs a client-free cooloff (observed ~10 min);
    launching real work into a sick tunnel just wedges the new process at
    device init. Returns False (and logs) if still unhealthy at max_wait.
    """
    t0 = time.time()
    while True:
        if probe_once():
            log("[health] device healthy")
            return True
        if time.time() - t0 >= max_wait:
            log(f"[health] device still unhealthy after {max_wait:.0f}s")
            return False
        log(f"[health] device unhealthy; cooling off {cooloff:.0f}s")
        time.sleep(cooloff)


if __name__ == "__main__":
    # shell-callable: exits 0 once healthy, 1 if max_wait expires
    max_wait = float(sys.argv[1]) if len(sys.argv) > 1 else 3600
    sys.exit(0 if wait_device_healthy(max_wait=max_wait) else 1)
