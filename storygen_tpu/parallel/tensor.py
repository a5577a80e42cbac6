"""Tensor parallelism for the StoryGen UNet over a ("data", "tensor") mesh.

The reference has no tensor parallelism (SURVEY.md §2.4) — the model fits
one chip. TP is this framework's extension for *latency*: a single story
frame's UNet passes shard across chips, cutting p50 per-story latency on a
v5e-8 where pure data parallelism only helps throughput.

Design (Megatron-style column/row split, GSPMD execution):
- attention q/k/v projection kernels (C, H*D): column-split -> heads shard
  across "tensor"; output projection (H*D, C): row-split, XLA inserts the
  psum.
- feed-forward GEGLU in-projection (C, 2*inner): column-split; out
  projection (inner, C): row-split + psum.
- resnet conv1 HWIO: output-channel split; conv2: input-channel split +
  psum; the GroupNorm between them stays local because SD-1.5 group
  boundaries align with the shards (C/shards is a multiple of the group
  size for 320/640/1280 over <=8 shards); its scale/bias shard with the
  channels, as does the time-embedding projection.
- everything else (embeddings, conv_in/out, norms on replicated
  activations) replicated.

No hand-written collectives: the specs below are placement constraints;
pjit/GSPMD propagates shardings and inserts all-reduces over ICI.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TENSOR_AXIS = "tensor"


def make_tp_mesh(data: int, tensor: int,
                 devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:data * tensor]).reshape(data, tensor)
    return Mesh(devices, (DATA_AXIS, TENSOR_AXIS))


def unet_param_spec(path: Tuple[str, ...], shape: Tuple[int, ...]) -> P:
    """PartitionSpec for one UNet parameter (path of flax name segments)."""
    name = path[-2] if len(path) >= 2 else ""
    leaf = path[-1]
    in_attn = any(seg.startswith("attn") for seg in path)
    in_ff = "ff" in path

    if in_attn:
        if name in ("to_q", "to_k", "to_v"):
            return P(None, TENSOR_AXIS) if leaf == "kernel" else P(TENSOR_AXIS)
        if name == "to_out_0":
            return P(TENSOR_AXIS, None) if leaf == "kernel" else P()
    if in_ff:
        if name == "proj":  # GEGLU packed (C, 2*inner)
            return P(None, TENSOR_AXIS) if leaf == "kernel" else P(TENSOR_AXIS)
        if name == "net_2":
            return P(TENSOR_AXIS, None) if leaf == "kernel" else P()
    if name == "conv1":
        # HWIO: shard output channels
        return P(None, None, None, TENSOR_AXIS) if leaf == "kernel" \
            else P(TENSOR_AXIS)
    if name == "conv2":
        # HWIO: shard input channels; psum restores the output
        return P(None, None, TENSOR_AXIS, None) if leaf == "kernel" else P()
    if name == "time_emb_proj":
        return P(None, TENSOR_AXIS) if leaf == "kernel" else P(TENSOR_AXIS)
    if name == "norm2" and "resnets" not in "".join(path):
        return P()
    # GroupNorm between conv1 and conv2 (resnet norm2): channel-sharded
    if leaf in ("scale", "bias") and len(path) >= 2 and \
            path[-2] == "norm2" and any("resnets" in seg for seg in path):
        return P(TENSOR_AXIS)
    return P()


def vae_param_spec(path: Tuple[str, ...], shape: Tuple[int, ...]) -> P:
    """PartitionSpec for one VAE parameter.

    The VAE decode is the dominant per-frame FIXED cost of the story
    rollout (BENCH.md "Known headroom"), and the reference's AutoencoderKL
    has no parallelism at all — this shards it for latency on the same
    ("data", "tensor") mesh as the UNet.

    The VAE's resnet blocks reuse the UNet naming (conv1 out-channel
    split -> norm2 sees whole groups per shard -> conv2 in-channel split,
    GSPMD inserts the psum), so unet_param_spec covers them; the only new
    rules are the mid-block single-head AttentionBlock
    (models/vae.py::VAEAttentionBlock, the diffusers AttentionBlock of
    /root/reference's VAE): query/key/value column-split over the channel
    axis (the q.kT contraction over the sharded channel becomes a psum),
    proj_attn row-split + psum.

    Group alignment at 8-way: decoder channels 512/256/128 with 32 groups
    give 4/2/1 whole groups per shard — norm2/group_norm stats stay local
    to a shard, same argument as the UNet's 320/640/1280."""
    name = path[-2] if len(path) >= 2 else ""
    leaf = path[-1]
    if name in ("query", "key", "value"):
        return P(None, TENSOR_AXIS) if leaf == "kernel" else P(TENSOR_AXIS)
    if name == "proj_attn":
        return P(TENSOR_AXIS, None) if leaf == "kernel" else P()
    # group_norm feeding sharded q/k/v stays replicated (acts on the
    # replicated block input); resnet norm1/norm2/conv1/conv2 fall through
    # to the UNet rules, which key on the shared names.
    if name == "group_norm":
        return P()
    return unet_param_spec(path, shape)


def shard_vae_params(params: Any, mesh: Mesh) -> Any:
    """Place VAE params on the mesh per vae_param_spec."""
    flat = flatten_dict(params["params"])
    ts = mesh.shape[TENSOR_AXIS]
    out = {}
    for path, w in flat.items():
        spec = vae_param_spec(path, np.shape(w))
        ok = all(d is None or np.shape(w)[i] % ts == 0
                 for i, d in enumerate(spec))
        out[path] = jax.device_put(
            w, NamedSharding(mesh, spec if ok else P()))
    return {"params": unflatten_dict(out)}


def shard_unet_params(params: Any, mesh: Mesh) -> Any:
    """Place UNet params on the mesh per unet_param_spec."""
    flat = flatten_dict(params["params"])
    out = {}
    for path, w in flat.items():
        spec = unet_param_spec(path, np.shape(w))
        # guard: axis size must divide the sharded dim
        ts = mesh.shape[TENSOR_AXIS]
        ok = all(d is None or np.shape(w)[i] % ts == 0
                 for i, d in enumerate(spec))
        sh = NamedSharding(mesh, spec if ok else P())
        out[path] = jax.device_put(w, sh)
    return {"params": unflatten_dict(out)}


def replicated_on(mesh: Mesh, tree: Any) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def _path_strs(path) -> Tuple[str, ...]:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return tuple(out)


def tp_place(tree: Any, mesh: Mesh) -> Any:
    """Place ANY pytree whose leaf paths end in UNet param names
    (trainable subtree, frozen subtree, optimizer moments) per
    unet_param_spec; unrecognized leaves replicate.

    Works on optimizer state too because adam moments mirror the param
    tree — their key paths carry the same trailing (module, leaf) names
    unet_param_spec keys on."""
    ts = mesh.shape[TENSOR_AXIS]

    def place(path, w):
        p = _path_strs(path)
        spec = unet_param_spec(p, np.shape(w))
        ok = (np.ndim(w) == len(spec) or spec == P()) and all(
            d is None or np.shape(w)[i] % ts == 0
            for i, d in enumerate(spec))
        return jax.device_put(w, NamedSharding(mesh, spec if ok else P()))

    return jax.tree_util.tree_map_with_path(place, tree)


def tp_shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Batch axis shards over 'data' only; 'tensor' sees full batches."""
    from storygen_tpu.parallel.mesh import REF_MAJOR_KEYS
    bs = NamedSharding(mesh, P(DATA_AXIS))
    ref_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    def place(path, x):
        x = np.asarray(x)
        key = _path_strs(path)[-1] if path else ""
        return jax.device_put(x, ref_sh if key in REF_MAJOR_KEYS else bs)

    return jax.tree_util.tree_map_with_path(place, batch)


def jit_train_step_tp(step_fn):
    """jit a training step for (data, tensor) execution.

    Inputs must be pre-placed (tp_place for state/frozen-unet,
    replicated_on for vae/text, tp_shard_batch for the batch): jit
    honors committed input shardings and GSPMD propagates them through
    grads and the optimizer — column/row-split params produce identically
    split moments and updates, with psums over 'tensor' inserted where
    row-split matmuls contract and over 'data' where the loss mean
    contracts the batch."""
    return jax.jit(step_fn, donate_argnums=(0,))
