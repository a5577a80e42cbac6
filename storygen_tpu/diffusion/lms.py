"""LMS (linear multistep) sampler over the k-diffusion sigma space.

Parity surface: the reference pipeline's accepted scheduler union includes
LMSDiscreteScheduler (/root/reference/model/pipeline.py:9-12). Same
Adams-Bashforth idea as PLMS but formulated in sigma space (x = x0 +
sigma*eps) with EXACT per-step coefficients: integrate the Lagrange
interpolation polynomial of the eps history over [sigma_i, sigma_{i+1}]
(Karras et al. lineage; diffusers LMSDiscreteScheduler).

TPU-first shape: every scheduler quantity is static per step index — the
float timestep grid (linspace, descending), the interpolated sigmas, and
the multistep coefficients (the integrand is a polynomial of degree <= 3,
so 3-point Gauss-Legendre integrates it EXACTLY — bitwise-equivalent in
fp64 to diffusers' adaptive quad up to quadrature roundoff). They are all
precomputed on the host into arrays indexed by the `lax.fori_loop`
counter; the only carried state is a fixed (4, ...) derivative ring.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion.schedule import make_schedule


class LMSState(NamedTuple):
    derivatives: jax.Array  # (4, B, ...) eps history ring, newest at [3]


def init_state(sample: jax.Array) -> LMSState:
    return LMSState(derivatives=jnp.zeros((4,) + sample.shape, jnp.float32))


def lms_tables(cfg: SchedulerConfig, num_inference_steps: int,
               order: int = 4
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(t_eval fp32 (n,), sigmas fp32 (n+1,), coeffs fp64 (n, order)).

    t_eval: descending float timesteps, linspace(0, T-1, n) reversed —
    LMSDiscreteScheduler.set_timesteps spacing (NOT the DDIM leading grid).
    sigmas: sqrt((1-acp)/acp) linearly interpolated at t_eval, with a
    trailing 0 (the ODE endpoint).
    coeffs[i, j]: multiplier of the j-th-newest derivative at step i;
    zero-padded beyond min(i+1, order).
    """
    n = num_inference_steps
    t_eval = np.linspace(0, cfg.num_train_timesteps - 1, n,
                         dtype=np.float64)[::-1].copy()
    # fp64 schedule: the Lagrange denominators are differences of nearby
    # sigmas, which amplify fp32 table roundoff ~30x into the coefficients
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            cfg.num_train_timesteps, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps, dtype=np.float64)
    else:  # rare; fp32-table fallback is fine off the SD operating point
        acp32 = np.asarray(make_schedule(cfg).alphas_cumprod, np.float64)
        betas = None
    acp = (np.cumprod(1.0 - betas) if betas is not None else acp32)
    sig_all = ((1.0 - acp) / acp) ** 0.5
    sigmas = np.interp(t_eval, np.arange(cfg.num_train_timesteps), sig_all)
    sigmas = np.concatenate([sigmas, [0.0]])

    # Gauss-Legendre nodes: exact for polynomials of degree <= 2*3-1 = 5
    gl_x, gl_w = np.polynomial.legendre.leggauss(3)
    coeffs = np.zeros((n, order), dtype=np.float64)
    for i in range(n):
        k = min(i + 1, order)
        a, bnd = sigmas[i], sigmas[i + 1]
        tau = 0.5 * (bnd - a) * gl_x + 0.5 * (bnd + a)  # map [-1,1]->[a,b]
        for j in range(k):
            # Lagrange basis through sigmas[i], sigmas[i-1], ... for the
            # j-th-newest history point sigma_{i-j}
            prod = np.ones_like(tau)
            for m in range(k):
                if m == j:
                    continue
                prod *= (tau - sigmas[i - m]) / (sigmas[i - j]
                                                 - sigmas[i - m])
            coeffs[i, j] = 0.5 * (bnd - a) * float((gl_w * prod).sum())
    return t_eval.astype(np.float32), sigmas.astype(np.float32), coeffs


def scale_model_input(sample: jax.Array, sigma: jax.Array) -> jax.Array:
    """UNet input scaling: x / sqrt(sigma^2 + 1)."""
    return (sample.astype(jnp.float32)
            / jnp.sqrt(sigma.astype(jnp.float32) ** 2 + 1.0)
            ).astype(sample.dtype)


def lms_step(eps: jax.Array, i: jax.Array, coeffs_row: jax.Array,
             sample: jax.Array, state: LMSState
             ) -> Tuple[jax.Array, LMSState]:
    """One LMS update x_i -> x_{i+1} in sigma space.

    For eps-prediction the k-diffusion derivative dx/dsigma IS the model
    output ((x - (x - sigma*eps))/sigma = eps), so the history ring stores
    eps directly. `coeffs_row` = coeffs[i] (4,), zero-padded — the sum
    over the full ring is exact because unused slots are zero-weighted
    AND zero-valued for i < 3.
    """
    dtype = sample.dtype
    x = sample.astype(jnp.float32)
    ring = jnp.concatenate([state.derivatives[1:],
                            eps.astype(jnp.float32)[None]], axis=0)
    # coeffs_row[j] weights the j-th-newest derivative = ring[3 - j]
    w = coeffs_row.astype(jnp.float32)[::-1]  # align to ring order
    upd = jnp.tensordot(w, ring, axes=(0, 0))
    del i  # the counter is fully encoded in coeffs_row
    return (x + upd).astype(dtype), LMSState(derivatives=ring)
