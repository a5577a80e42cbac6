"""PNDM (PLMS) sampler: the scheduler class the SD-1.5 checkpoint names.

Parity surface: /root/reference/ckpt/stable-diffusion-v1-5/scheduler/
scheduler_config.json declares `_class_name: PNDMScheduler` with
`skip_prk_steps: true`, and the reference pipeline's accepted scheduler
union includes it (/root/reference/model/pipeline.py:9-12). With
skip_prk_steps the Runge-Kutta warmup is disabled and the method is pure
PLMS: a 4th-order Adams-Bashforth linear multistep over eps predictions
(Liu et al. 2022, arXiv:2202.09778), with the first two steps bootstrapped
by (a) a plain transfer and (b) a trapezoid average re-evaluated at the
SAME sample — which is why the PLMS timestep list has n+1 entries with the
second-highest timestep visited twice.

TPU-first shape: diffusers keeps Python-side mutable state (`self.ets`
list, `self.counter`, `self.cur_sample`); here the history is a fixed
(4, ...) ring buffer + the bootstrap sample carried as a loop pytree, and
the counter IS the `lax.fori_loop` index, so the whole trajectory jits
into one program. The timestep juggling at counter==1 (coefficients use
t+ratio -> t while the model saw t) is resolved on the host into three
static arrays (t_eval / t_coeff / prev_coeff) — no in-loop branching on
timesteps.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion.schedule import NoiseSchedule, _bcast, _gather


class PNDMState(NamedTuple):
    ets: jax.Array         # (4, B, ...) eps history ring, newest at [3]
    cur_sample: jax.Array  # the sample the counter==1 re-evaluation reuses


def init_state(sample: jax.Array) -> PNDMState:
    z = jnp.zeros((4,) + sample.shape, jnp.float32)
    return PNDMState(ets=z, cur_sample=jnp.zeros_like(sample, jnp.float32))


def plms_timesteps(cfg: SchedulerConfig, num_inference_steps: int
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(t_eval, t_coeff, prev_coeff), each len n+1, descending.

    Mirrors PNDMScheduler.set_timesteps with skip_prk_steps=true: ascending
    arange(n)*ratio + steps_offset, then [:-1] + [-2:-1] + [-1:] reversed —
    the second entry appears twice. t_eval is what the UNet (and ref_t)
    sees; (t_coeff, prev_coeff) feed the transfer formula, encoding the
    counter==1 juggling (prev=t, t=t+ratio) statically.
    """
    n = num_inference_steps
    ratio = cfg.num_train_timesteps // n
    ts = (np.arange(0, n) * ratio).round().astype(np.int64) + cfg.steps_offset
    plms = np.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1]
    t_eval = plms.copy()
    t_coeff = plms.copy()
    prev_coeff = plms - ratio
    if len(t_eval) > 1:
        prev_coeff[1] = t_eval[1]
        t_coeff[1] = t_eval[1] + ratio
    return t_eval, t_coeff, prev_coeff


def _transfer(sched: NoiseSchedule, sample: jax.Array, t: jax.Array,
              prev_t: jax.Array, eps: jax.Array) -> jax.Array:
    """PNDM transfer formula (paper eq. 11; diffusers _get_prev_sample).

    x_prev = sqrt(acp_prev/acp_t) x
             - (acp_prev - acp_t) eps / denom,
    denom = acp_t sqrt(beta_prev) + sqrt(acp_t beta_t acp_prev).
    prev_t < 0 selects final_alpha_cumprod (set_alpha_to_one=false).
    """
    nd = sample.ndim
    acp_t = _bcast(_gather(sched.alphas_cumprod, t), nd)
    acp_prev = jnp.where(prev_t >= 0, _gather(sched.alphas_cumprod, prev_t),
                         sched.final_alpha_cumprod)
    acp_prev = _bcast(jnp.atleast_1d(acp_prev), nd)
    beta_t = 1.0 - acp_t
    beta_prev = 1.0 - acp_prev
    coeff = jnp.sqrt(acp_prev / acp_t)
    denom = acp_t * jnp.sqrt(beta_prev) + jnp.sqrt(acp_t * beta_t * acp_prev)
    return coeff * sample - (acp_prev - acp_t) * eps / denom


def plms_step(sched: NoiseSchedule, eps: jax.Array, i: jax.Array,
              t_coeff: jax.Array, prev_coeff: jax.Array, sample: jax.Array,
              state: PNDMState) -> Tuple[jax.Array, PNDMState]:
    """One PLMS update at loop counter `i` (0-based, == diffusers counter).

    `eps` is the model output at t_eval[i]; `t_coeff`/`prev_coeff` are the
    precomputed transfer timesteps for this counter. Returns
    (x_{prev}, new state) in fp32 math, cast back to sample.dtype.
    """
    dtype = sample.dtype
    x = sample.astype(jnp.float32)
    e = eps.astype(jnp.float32)
    ets = state.ets

    # history append happens for every counter EXCEPT 1 (diffusers
    # step_plms: `if self.counter != 1: self.ets.append(...)`)
    appended = jnp.concatenate([ets[1:], e[None]], axis=0)
    new_ets = jnp.where(i == 1, ets, appended)

    def c0(_):   # counter 0: plain transfer, remember the sample
        return e, x

    def c1(_):   # counter 1: trapezoid of (new, last) at the SAME sample
        return (e + ets[3]) / 2.0, state.cur_sample

    def c2(_):   # 2-step Adams-Bashforth
        return (3.0 * appended[3] - appended[2]) / 2.0, x

    def c3(_):   # 3-step
        return (23.0 * appended[3] - 16.0 * appended[2]
                + 5.0 * appended[1]) / 12.0, x

    def c4(_):   # 4-step (steady state)
        return (55.0 * appended[3] - 59.0 * appended[2]
                + 37.0 * appended[1] - 9.0 * appended[0]) / 24.0, x

    model_out, x_used = jax.lax.switch(
        jnp.minimum(i, 4), (c0, c1, c2, c3, c4), None)
    prev = _transfer(sched, x_used, t_coeff, prev_coeff, model_out)
    new_cur = jnp.where(i == 0, x, state.cur_sample)
    return prev.astype(dtype), PNDMState(ets=new_ets, cur_sample=new_cur)
