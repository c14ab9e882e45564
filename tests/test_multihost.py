"""Multi-host simulation: two jax.distributed CPU processes cooperating on
a sharded hit-count computation (the multi-host story the reference never
had; SURVEY.md §5)."""
import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="127.0.0.1:12399",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 4, f"expected 4 global devices, got {len(devs)}"
mesh = Mesh(np.array(devs).reshape(4, 1), ("data", "seed"))

rng = np.random.default_rng(0)
V = rng.integers(0, 2, (8, 256)).astype(np.int8)
M = rng.integers(0, 2, (256, 32)).astype(np.int8)

# each process provides its shard of the query batch
from jax.experimental import multihost_utils
sharding = NamedSharding(mesh, P("data", None))
gV = multihost_utils.host_local_array_to_global_array(
    V[pid * 4:(pid + 1) * 4], mesh, P("data", None))
gM = multihost_utils.host_local_array_to_global_array(M, mesh, P())

@jax.jit
def counts(v, m):
    return jax.lax.dot_general(v, m, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

out = jax.jit(counts, out_shardings=NamedSharding(mesh, P("data", None)))(gV, gM)
local = multihost_utils.global_array_to_host_local_array(
    out, mesh, P("data", None))
want = V[pid * 4:(pid + 1) * 4].astype(np.int32) @ M.astype(np.int32)
assert np.array_equal(np.asarray(local), want), "shard mismatch"
print(f"proc {pid} OK")
"""


def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
