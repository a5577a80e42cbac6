"""DPM-Solver++(2M): second-order multistep ODE sampler.

Parity surface: the reference pipeline accepts a
DPMSolverMultistepScheduler (model/pipeline.py:9-12); this is its
pure-function TPU equivalent. Practical value: ~20-25 steps match DDIM-50
quality, halving story latency at the same UNet cost per step.

Formulation (Lu et al. 2022, arXiv:2211.01095, algorithm 2M, data
prediction):
  alpha_t = sqrt(acp_t), sigma_t = sqrt(1-acp_t),
  lambda_t = log(alpha_t/sigma_t)
  h_i = lambda_i - lambda_{i-1}
  r = h_{i-1}/h_i
  D = (1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}      (first step: D = x0_i)
  x_i = (sigma_i/sigma_{i-1}) x_{i-1} - alpha_i (exp(-h_i) - 1) D

State threads (prev_x0, prev_t) through the sampling loop — a pytree
carried by lax.fori_loop.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from storygen_tpu.diffusion.schedule import (NoiseSchedule, _bcast, _gather,
                                             pred_original_sample)


class DPMState(NamedTuple):
    prev_x0: jax.Array   # data prediction at the previous step
    prev_t: jax.Array    # its timestep (int32); -1 = none yet


def init_state(sample: jax.Array) -> DPMState:
    return DPMState(prev_x0=jnp.zeros_like(sample, dtype=jnp.float32),
                    prev_t=jnp.asarray(-1, jnp.int32))


def _alpha_sigma_lambda(sched: NoiseSchedule, t: jax.Array, ndim: int):
    acp = _bcast(_gather(sched.alphas_cumprod, t), ndim)
    alpha = jnp.sqrt(acp)
    sigma = jnp.sqrt(1.0 - acp)
    lam = jnp.log(alpha) - jnp.log(sigma)
    return alpha, sigma, lam


def dpmpp_2m_step(sched: NoiseSchedule, model_output: jax.Array,
                  t: jax.Array, prev_t: jax.Array, sample: jax.Array,
                  state: DPMState) -> Tuple[jax.Array, DPMState]:
    """One DPM-Solver++(2M) update x_t -> x_{prev_t}.

    prev_t < 0 (past the last step) falls back to returning the data
    prediction (the ODE endpoint).
    """
    dtype = sample.dtype
    x = sample.astype(jnp.float32)
    x0, _ = pred_original_sample(sched, model_output, t, sample)

    nd = x.ndim
    _, sigma_s, lam_s = _alpha_sigma_lambda(sched, t, nd)
    t_next = jnp.maximum(prev_t, 0)
    alpha_d, sigma_d, lam_d = _alpha_sigma_lambda(sched, t_next, nd)
    h = lam_d - lam_s

    def first_order():
        return x0

    def second_order():
        _, _, lam_p = _alpha_sigma_lambda(sched, jnp.maximum(state.prev_t, 0),
                                          nd)
        h_last = lam_s - lam_p
        r = h_last / h
        return (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * state.prev_x0

    d = jax.lax.cond(state.prev_t < 0, first_order, second_order)
    x_next = (sigma_d / sigma_s) * x - alpha_d * (jnp.exp(-h) - 1.0) * d
    x_next = jnp.where(prev_t >= 0, x_next, x0)
    return x_next.astype(dtype), DPMState(prev_x0=x0,
                                          prev_t=jnp.asarray(t, jnp.int32))
