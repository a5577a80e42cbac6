"""Worker process for tests/test_multihost.py: 2-process gloo-CPU data
parallelism through parallel/multihost.py. Run as
`python multihost_worker.py <rank> <port>`; prints "MEAN <v>" and
"GRADW <v>" which the parent asserts against a single-process oracle."""
import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from storygen_tpu.parallel import multihost as MH  # noqa: E402

assert MH.initialize(f"127.0.0.1:{port}", 2, rank)
assert jax.process_count() == 2
assert MH.is_coordinator() == (rank == 0)

mesh = MH.global_mesh()
assert mesh.devices.size == 4  # 2 procs x 2 virtual CPU devices

# each process holds its own half of the global batch (rows 0-3 / 4-7)
local = np.arange(rank * 4, rank * 4 + 4, dtype=np.float32).reshape(4, 1)
batch = MH.host_local_batch({"image": local}, mesh)["image"]
assert batch.shape == (8, 1)

rep = NamedSharding(mesh, P())
mean = jax.jit(lambda x: x.mean(), out_shardings=rep)(batch)
print("MEAN", float(jax.device_get(mean)), flush=True)

# replicated-param DP gradient: psum over the sharded batch is implicit
w = jax.device_put(jnp.asarray(2.0), rep)


@jax.jit
def gradw(w, x):
    return jax.grad(lambda w: jnp.mean((x[:, 0] * w - 1.0) ** 2))(w)


g = gradw(w, batch)
print("GRADW", float(jax.device_get(g)), flush=True)
