"""Device mesh setup and multi-host initialization.

The reference's entire device story was an env-var GPU pin and a TF1 session
(ref: bbhMahoGANy.py:72-81, runGAN.sh:10). The TPU-native equivalent: one
program owns a named mesh; train steps are shard_mapped over the 'data' axis
with psum gradient reduction riding ICI; multi-host slices join via
jax.distributed.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (no-op on a single host).

    Call once at program start on every host of a multi-host slice; safe to
    skip entirely for single-host runs.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def data_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over all (or the first n) devices, axis name 'data'."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), ("data",), devices=np.asarray(devs))


def shard_batch(mesh: Mesh):
    """NamedSharding that splits the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    """NamedSharding that replicates an array across the mesh."""
    return NamedSharding(mesh, P())
