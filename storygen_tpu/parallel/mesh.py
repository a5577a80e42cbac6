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
DCN_AXIS = "dcn"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_hybrid_mesh(n_slices: int,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D (dcn, data) mesh for multi-slice data parallelism.

    Axis 0 spans pod slices (linked by DCN), axis 1 the chips within a
    slice (ICI). The batch shards over BOTH axes (`batch_sharding`
    returns P(('dcn', 'data')) on this mesh), so the gradient psum
    decomposes hierarchically: a fat intra-slice reduce over ICI plus a
    small inter-slice reduce of per-slice partial sums over DCN — the
    standard hierarchical-DP layout for multislice TPU. On real
    multi-slice hardware build the device array with
    jax.experimental.mesh_utils.create_hybrid_device_mesh so axis 0
    aligns with slice boundaries; the reshape below is exact for
    single-host virtual meshes (tests) and single-slice order.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_slices:
        raise ValueError(f"{n} devices not divisible into {n_slices} slices")
    arr = np.asarray(devices).reshape(n_slices, n // n_slices)
    return Mesh(arr, (DCN_AXIS, DATA_AXIS))


def _batch_axes(mesh: Mesh):
    """Every mesh axis participates in batch sharding (hierarchical DP)."""
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across all data axes of the mesh."""
    return NamedSharding(mesh, P(_batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Batch keys whose arrays are ref-major (N_refs, B, ...): the batch axis
# to shard is axis 1 (data/loader.py collate layout).
REF_MAJOR_KEYS = frozenset(
    {"ref_images", "ref_input_ids", "ref_latent_moments", "ref_masks"})


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree with the batch axis sharded.

    Sharding is decided by key name, not shape: the keys in REF_MAJOR_KEYS
    carry a leading ref axis and shard on axis 1; everything else shards
    on axis 0. (A shape heuristic misfires on small batches — a
    (2, 512, 512, 3) image batch looks ref-major.)
    """
    bs = batch_sharding(mesh)
    ref_sh = NamedSharding(mesh, P(None, _batch_axes(mesh)))

    def place(path, x):
        x = np.asarray(x)
        key = str(path[-1].key) if path and hasattr(path[-1], "key") else ""
        return jax.device_put(x, ref_sh if key in REF_MAJOR_KEYS else bs)

    return jax.tree_util.tree_map_with_path(place, batch)


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
