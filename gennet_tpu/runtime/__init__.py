"""Runtime setup: the L1 layer (device/runtime config).

Replaces the reference's TF1 session plumbing (CUDA_VISIBLE_DEVICES pin +
allow_growth session, ref: bbhMahoGANy.py:72-81) with JAX runtime hygiene:
a persistent compilation cache (TPU compiles are expensive — O(minutes) for
the fused bank/train programs), optional NaN debugging, and mesh/device
reporting.
"""

import os

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/gennet_tpu_xla")


def setup(compilation_cache_dir: str | None = _DEFAULT_CACHE,
          debug_nans: bool = False) -> dict:
    """Configure the JAX runtime; returns a device-info dict.

    Call once at program start (the CLI, bench, and graft entries do).
    """
    if compilation_cache_dir:
        os.makedirs(compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "n_devices": len(devs),
        "devices": [str(d) for d in devs],
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
