"""Euler discrete + Euler ancestral samplers.

Parity surface: the reference pipeline's scheduler union includes
EulerDiscreteScheduler and EulerAncestralDiscreteScheduler
(model/pipeline.py:9-12). Same precomputed-table design as schedule.py:
sigma_t = sqrt((1-acp_t)/acp_t) (the k-diffusion parameterization), model
input scaled by 1/sqrt(sigma^2+1).

Note: with Euler schedulers the pipeline must scale latents by
init_noise_sigma = sigma_max and apply scale_model_input; the sampler
functions below fold both in.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from storygen_tpu.diffusion.schedule import NoiseSchedule, _bcast, _gather


def sigma_of(sched: NoiseSchedule, t: jax.Array) -> jax.Array:
    acp = _gather(sched.alphas_cumprod, t)
    return jnp.sqrt((1.0 - acp) / acp)


def scale_model_input(sched: NoiseSchedule, sample: jax.Array,
                      t: jax.Array) -> jax.Array:
    sigma = _bcast(jnp.atleast_1d(sigma_of(sched, t)), sample.ndim)
    return (sample.astype(jnp.float32)
            / jnp.sqrt(sigma ** 2 + 1.0)).astype(sample.dtype)


def euler_step(sched: NoiseSchedule, model_output: jax.Array, t: jax.Array,
               prev_t: jax.Array, sample: jax.Array) -> jax.Array:
    """Deterministic Euler update in sigma space.

    `sample` lives in the sigma-scaled space (x = x0 + sigma*eps); the
    model is assumed eps-prediction evaluated on scale_model_input(x).
    """
    dtype = sample.dtype
    x = sample.astype(jnp.float32)
    nd = x.ndim
    sigma = _bcast(jnp.atleast_1d(sigma_of(sched, t)), nd)
    sigma_next = jnp.where(
        prev_t >= 0,
        _bcast(jnp.atleast_1d(sigma_of(sched, jnp.maximum(prev_t, 0))), nd),
        jnp.zeros_like(sigma))
    # eps-pred: derivative dx/dsigma = eps
    d = model_output.astype(jnp.float32)
    return (x + d * (sigma_next - sigma)).astype(dtype)


def euler_ancestral_step(sched: NoiseSchedule, model_output: jax.Array,
                         t: jax.Array, prev_t: jax.Array,
                         sample: jax.Array,
                         noise: jax.Array) -> jax.Array:
    """Euler ancestral: stochastic update with sigma_up/sigma_down split."""
    dtype = sample.dtype
    x = sample.astype(jnp.float32)
    nd = x.ndim
    s = _bcast(jnp.atleast_1d(sigma_of(sched, t)), nd)
    s_next = jnp.where(
        prev_t >= 0,
        _bcast(jnp.atleast_1d(sigma_of(sched, jnp.maximum(prev_t, 0))), nd),
        jnp.zeros_like(s))
    var_up = s_next ** 2 * (s ** 2 - s_next ** 2) / jnp.maximum(s ** 2, 1e-12)
    sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
    sigma_down = jnp.sqrt(jnp.maximum(s_next ** 2 - sigma_up ** 2, 0.0))
    d = model_output.astype(jnp.float32)
    x = x + d * (sigma_down - s)
    x = x + noise.astype(jnp.float32) * sigma_up
    return x.astype(dtype)
