"""Multi-host (multi-process) scaffolding: DCN-ready data parallelism.

The reference scales with one process per GPU under `accelerate launch
--multi_gpu` (README.md:111-114). The TPU-native equivalent for a single
slice is one process owning all chips (parallel/mesh.py); this module adds
the MULTI-HOST story (several processes, e.g. one per v5e host or per
pod-slice worker):

- `initialize()` wraps jax.distributed.initialize (coordinator address,
  process count and index from args or the standard env vars). Must run
  before the backend is first touched.
- `global_mesh()` builds the data mesh over ALL processes' devices.
- `host_local_batch()` turns each process's host-local numpy batch into a
  global jax.Array sharded over the full mesh
  (jax.make_array_from_process_local_data) — every process loads only its
  own 1/num_processes of the batch (DataLoader shard_id/num_shards).
- `is_coordinator()` gates checkpoint/log writes to process 0.

Gradient all-reduce stays implicit: the same pjit'd step as single-host
emits psums that ride ICI within a slice and DCN across slices.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from storygen_tpu.parallel.mesh import DATA_AXIS, REF_MAJOR_KEYS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax's distributed runtime if configured.

    Returns True when running multi-process. No-ops (returns False) when
    neither args nor env (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) request it, so single-host runs
    need no flags.
    """
    coordinator_address = (coordinator_address
                          or os.environ.get("JAX_COORDINATOR_ADDRESS")
                          or os.environ.get("COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return jax.process_count() > 1


def is_coordinator() -> bool:
    return jax.process_index() == 0


def global_mesh() -> Mesh:
    """1-D data mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (DATA_AXIS,))


def host_local_batch(batch: Any, mesh: Mesh) -> Any:
    """Per-process host-local batch pytree -> global sharded jax.Arrays.

    Each process passes its own shard (global_batch / num_processes rows;
    ref-major keys shard on axis 1 as in mesh.shard_batch). Falls back to
    plain device_put sharding when single-process (identical semantics).
    """
    bs = NamedSharding(mesh, P(DATA_AXIS))
    ref_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    def place(path, x):
        x = np.asarray(x)
        key = str(path[-1].key) if path and hasattr(path[-1], "key") else ""
        sh = ref_sh if key in REF_MAJOR_KEYS else bs
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map_with_path(place, batch)
