"""Pure-function noise schedules: DDPM (training) and DDIM (sampling).

TPU-first design: the schedule is a small pytree of precomputed arrays; every
op (add_noise, ddim_step, ddpm_step) is a pure function over traced timestep
arrays, so the whole denoising loop jits into a single `lax.fori_loop`.

Numerics match the reference operating point:
- scaled_linear betas, 1000 train steps, beta_start 0.00085, beta_end 0.012
  (ckpt/stable-diffusion-v1-5/scheduler/scheduler_config.json)
- DDIM with steps_offset=1, set_alpha_to_one=false, clip_sample=false
  ("leading" timestep spacing as used by diffusers 0.13's DDIMScheduler,
  consumed at model/pipeline.py:366,461)
- DDPM add_noise as used in training (train_StorySalon_stage2.py:300,313).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from storygen_tpu.configs import SchedulerConfig


class NoiseSchedule(NamedTuple):
    """Precomputed schedule tables. All fp32, shape (num_train_timesteps,)."""
    betas: jax.Array
    alphas_cumprod: jax.Array
    final_alpha_cumprod: jax.Array  # scalar
    num_train_timesteps: int
    clip_sample: bool
    prediction_type: str

    @property
    def init_noise_sigma(self) -> float:
        return 1.0  # DDIM/DDPM (pipeline.py:270 multiplies by this)


def make_schedule(cfg: SchedulerConfig = SchedulerConfig()) -> NoiseSchedule:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n,
                            dtype=np.float64) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(n, dtype=np.float64)
        betas = np.minimum(1 - alpha_bar((ts + 1) / n) / alpha_bar(ts / n), 0.999)
    else:
        raise ValueError(f"unknown beta_schedule {cfg.beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if cfg.set_alpha_to_one else float(alphas_cumprod[0])
    return NoiseSchedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, dtype=jnp.float32),
        num_train_timesteps=n,
        clip_sample=cfg.clip_sample,
        prediction_type=cfg.prediction_type,
    )


def _gather(table: jax.Array, t: jax.Array) -> jax.Array:
    """Gather per-timestep scalars; t<0 is clamped (callers mask separately)."""
    return jnp.take(table, jnp.clip(t, 0, table.shape[0] - 1).astype(jnp.int32))


def _bcast(x: jax.Array, ndim: int) -> jax.Array:
    """Right-pad scalar-per-batch values with singleton dims."""
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def add_noise(sched: NoiseSchedule, samples: jax.Array, noise: jax.Array,
              timesteps: jax.Array) -> jax.Array:
    """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps.

    Matches DDPMScheduler.add_noise used at train_StorySalon_stage2.py:300.
    `timesteps` is int, shape () or (B,). Computed in fp32, cast back.
    """
    t = jnp.asarray(timesteps)
    acp = _bcast(_gather(sched.alphas_cumprod, t), samples.ndim)
    out = (jnp.sqrt(acp) * samples.astype(jnp.float32)
           + jnp.sqrt(1.0 - acp) * noise.astype(jnp.float32))
    return out.astype(samples.dtype)


def velocity(sched: NoiseSchedule, samples: jax.Array, noise: jax.Array,
             timesteps: jax.Array) -> jax.Array:
    """v-prediction target: sqrt(acp) eps - sqrt(1-acp) x0."""
    t = jnp.asarray(timesteps)
    acp = _bcast(_gather(sched.alphas_cumprod, t), samples.ndim)
    out = (jnp.sqrt(acp) * noise.astype(jnp.float32)
           - jnp.sqrt(1.0 - acp) * samples.astype(jnp.float32))
    return out.astype(samples.dtype)


def ddim_timesteps(sched_cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending inference timesteps with "leading" spacing + steps_offset.

    Reproduces diffusers-0.13 DDIMScheduler.set_timesteps (consumed at
    model/pipeline.py:366-367): arange(n)*ratio, reversed, + steps_offset.
    """
    ratio = sched_cfg.num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * ratio).round()[::-1].astype(np.int64)
    ts = ts + sched_cfg.steps_offset
    return ts


def pred_original_sample(sched: NoiseSchedule, model_output: jax.Array,
                         t: jax.Array, sample: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Recover (pred_x0, pred_eps) from the model output at timestep t."""
    acp_t = _bcast(_gather(sched.alphas_cumprod, t), sample.ndim)
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)
    if sched.prediction_type == "epsilon":
        x0 = (sample - jnp.sqrt(1.0 - acp_t) * model_output) / jnp.sqrt(acp_t)
        eps = model_output
    elif sched.prediction_type == "v_prediction":
        x0 = jnp.sqrt(acp_t) * sample - jnp.sqrt(1.0 - acp_t) * model_output
        eps = jnp.sqrt(acp_t) * model_output + jnp.sqrt(1.0 - acp_t) * sample
    elif sched.prediction_type == "sample":
        x0 = model_output
        eps = (sample - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)
    else:
        raise ValueError(sched.prediction_type)
    if sched.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
        eps = (sample - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)
    return x0, eps


def ddim_step(sched: NoiseSchedule, model_output: jax.Array, t: jax.Array,
              prev_t: jax.Array, sample: jax.Array, eta: float = 0.0,
              noise: Optional[jax.Array] = None) -> jax.Array:
    """One DDIM update x_t -> x_{prev_t} (model/pipeline.py:461).

    `t`/`prev_t` are traced int scalars so the loop stays inside jit.
    prev_t < 0 selects final_alpha_cumprod (set_alpha_to_one=false semantics).
    """
    dtype = sample.dtype
    x0, eps = pred_original_sample(sched, model_output, t, sample)
    acp_prev = jnp.where(prev_t >= 0, _gather(sched.alphas_cumprod, prev_t),
                         sched.final_alpha_cumprod)
    acp_prev = _bcast(jnp.atleast_1d(acp_prev), sample.ndim)
    if eta > 0.0:
        acp_t = _bcast(_gather(sched.alphas_cumprod, t), sample.ndim)
        var = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
        std = eta * jnp.sqrt(var)
    else:
        std = jnp.zeros_like(acp_prev)
    direction = jnp.sqrt(1.0 - acp_prev - std ** 2) * eps
    prev = jnp.sqrt(acp_prev) * x0 + direction
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        prev = prev + std * noise.astype(jnp.float32)
    return prev.astype(dtype)


def ddpm_step(sched: NoiseSchedule, model_output: jax.Array, t: jax.Array,
              sample: jax.Array, noise: jax.Array) -> jax.Array:
    """One ancestral DDPM update x_t -> x_{t-1} (variance_type fixed_small)."""
    dtype = sample.dtype
    x0, _ = pred_original_sample(sched, model_output, t, sample)
    acp_t = _bcast(_gather(sched.alphas_cumprod, t), sample.ndim)
    acp_prev = jnp.where(t - 1 >= 0, _gather(sched.alphas_cumprod, t - 1),
                         jnp.ones_like(acp_t))
    beta_t = _bcast(_gather(sched.betas, t), sample.ndim)
    alpha_t = 1.0 - beta_t
    # posterior mean coefficients (Ho et al. eq. 7)
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * sample.astype(jnp.float32)
    var = jnp.clip((1.0 - acp_prev) / (1.0 - acp_t) * beta_t, 1e-20)
    t_b = _bcast(jnp.atleast_1d(jnp.asarray(t)), sample.ndim)
    prev = mean + jnp.where(t_b > 0, jnp.sqrt(var) * noise.astype(jnp.float32), 0.0)
    return prev.astype(dtype)
