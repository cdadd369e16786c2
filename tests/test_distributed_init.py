"""Multi-process jax.distributed smoke (VERDICT r2 weak #7 / next #9).

``mesh.distributed_init`` wraps ``jax.distributed.initialize``; nothing on a
single chip ever exercises it. This test launches a REAL 2-process local CPU
cluster in subprocesses: both workers call distributed_init with a
coordinator address, build the global mesh, and psum a value across
processes — asserting the call path, the rendezvous, and the collective.

Marked slow: spawns processes and pays two fresh JAX startups.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
sys.path.insert(0, {repo})

import jax
import jax.numpy as jnp
from gennet_tpu.train.mesh import distributed_init, data_mesh

pid = int(sys.argv[1])
distributed_init(coordinator_address="127.0.0.1:" + {port!r},
                 num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2      # global devices across both processes
mesh = data_mesh()

from jax.sharding import PartitionSpec as P

@jax.jit
def summed(x):
    def f(x):
        return jax.lax.psum(x, "data")
    return jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P(),
                         check_vma=False)(x)

# each process contributes its local shard of the global (2,) array
local = jnp.asarray([float(pid + 1)])
from jax.sharding import NamedSharding
garr = jax.make_array_from_single_device_arrays(
    (2,), NamedSharding(mesh, P("data")), [local])
out = summed(garr)
# the addressable shard of the replicated output holds the global sum 1+2=3
val = float(out.addressable_data(0)[0])
assert val == 3.0, val
print(f"proc {pid}: psum ok ({val})", flush=True)
"""


@pytest.mark.slow
def test_distributed_init_two_process_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (_WORKER.replace("{repo}", repr(repo))
                    .replace("{port!r}", repr(str(port))))
    procs = []
    for pid in (0, 1):
        f = tmp_path / f"worker{pid}.py"
        f.write_text(code)
        # env must be set at LAUNCH: the container's sitecustomize registers
        # the axon PJRT plugin (gated on PALLAS_AXON_POOL_IPS) at interpreter
        # start, before any in-script os.environ assignment runs
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS")}
        env["JAX_PLATFORMS"] = "cpu"  # 1 local CPU device per process
        procs.append(subprocess.Popen(
            [sys.executable, str(f), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "psum ok" in out
