"""Device mesh + sharding for data-parallel training and batched serving.

The reference's distribution story is one process per GPU with NCCL
all-reduce hidden inside accelerate/DDP (train_StorySalon_stage2.py:222-224,
README.md:111-114). The TPU-native equivalent (SURVEY.md §2.4): a single
process owns all chips; a 1-D `data` mesh over ICI; batch-sharded
activations, replicated params; pjit emits the psum gradient all-reduce.

A second optional `tensor` axis is reserved for sharding the 1280-wide
blocks if the model outgrows one chip's HBM — not needed at 0.86B bf16.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with the batch axis sharded.

    Arrays whose leading dim is the ref axis (N, B, ...) shard on axis 1.
    """
    bs = batch_sharding(mesh)

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 2 and x.shape[0] in (2, 3, 4) and \
                x.shape[1] % mesh.shape[DATA_AXIS] == 0 and \
                x.shape[0] < x.shape[1]:
            # (N_refs, B, ...): shard axis 1
            sh = NamedSharding(mesh, P(None, DATA_AXIS))
        else:
            sh = bs
        return jax.device_put(x, sh)

    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def jit_train_step(step_fn, mesh: Mesh):
    """jit a training step for data-parallel execution on `mesh`.

    state/frozen replicated, batch sharded on its batch axis, outputs
    (state, metrics) replicated. XLA inserts the gradient psum because the
    loss mean contracts over the sharded batch axis.
    """
    rep = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, None, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
