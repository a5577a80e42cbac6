"""Data-parallel batched serving over an ICI mesh.

Multi-chip story serving: params replicated, the story batch sharded on
the `data` axis — the pjit analogue of running N reference processes, but
with one program and XLA-scheduled collectives (none are needed in pure DP
inference; sharding simply partitions every batched op).

Usage:
    mesh = make_mesh(8)
    out = sample_data_parallel(sampler, mesh, params, ...same args...)
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from storygen_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicated


def _shard_leading_batch(mesh, num_refs_axes=()):
    return NamedSharding(mesh, P(DATA_AXIS))


def place_sample_args(mesh, params, latents, text_u, text_c, ref_latents,
                      zero_latents, prev_u, prev_c, noise):
    """Place sampler args: params replicated, batch-major arrays sharded on
    their batch axis ((B,...) axis 0; (N,B,...) axis 1)."""
    rep = replicated(mesh)
    b_sh = NamedSharding(mesh, P(DATA_AXIS))
    nb_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    def put(x, sh):
        return None if x is None else jax.device_put(x, sh)

    return (jax.tree.map(lambda x: jax.device_put(x, rep), params),
            put(latents, b_sh), put(text_u, b_sh), put(text_c, b_sh),
            put(ref_latents, nb_sh), put(zero_latents, b_sh),
            put(prev_u, nb_sh), put(prev_c, nb_sh), put(noise, b_sh))


def sample_data_parallel(sampler, mesh, params, latents, text_u, text_c,
                         ref_latents, zero_latents, prev_u, prev_c, noise,
                         guidance_scale, image_guidance_scale, *, stage,
                         num_inference_steps):
    """Run StoryGenSampler.sample with the batch sharded over `mesh`.

    Batch size must be divisible by the mesh size. The jitted sample fn
    propagates the input shardings, so every UNet call runs data-parallel.
    """
    placed = place_sample_args(mesh, params, latents, text_u, text_c,
                               ref_latents, zero_latents, prev_u, prev_c,
                               noise)
    return sampler.sample(*placed, guidance_scale, image_guidance_scale,
                          stage=stage,
                          num_inference_steps=num_inference_steps)
