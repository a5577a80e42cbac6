"""LMS sampler tests.

Golden: a stateful numpy mirror of diffusers-0.13 LMSDiscreteScheduler
(linspace float timesteps, interpolated sigmas, Lagrange-integrated
multistep coefficients via scipy.integrate.quad — the exact code path the
reference pipeline's scheduler union accepts, model/pipeline.py:9-12).
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy import integrate

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion import lms as L
from storygen_tpu.diffusion import schedule as S


class _DiffusersLMSMirror:
    """Numpy mirror of LMSDiscreteScheduler semantics (order 4)."""

    def __init__(self, cfg: SchedulerConfig, num_inference_steps: int):
        betas = (np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                             cfg.num_train_timesteps) ** 2)
        acp = np.cumprod(1.0 - betas)
        sig_all = ((1 - acp) / acp) ** 0.5
        self.timesteps = np.linspace(0, cfg.num_train_timesteps - 1,
                                     num_inference_steps)[::-1].copy()
        sig = np.interp(self.timesteps, np.arange(cfg.num_train_timesteps),
                        sig_all)
        self.sigmas = np.concatenate([sig, [0.0]])
        self.derivatives = []

    def get_lms_coefficient(self, order, t, current_order):
        def lms_derivative(tau):
            prod = 1.0
            for k in range(order):
                if current_order == k:
                    continue
                prod *= ((tau - self.sigmas[t - k])
                         / (self.sigmas[t - current_order]
                            - self.sigmas[t - k]))
            return prod
        coeff = integrate.quad(lms_derivative, self.sigmas[t],
                               self.sigmas[t + 1], epsrel=1e-10)[0]
        return coeff

    def step(self, model_output, step_index, sample, order=4):
        sigma = self.sigmas[step_index]
        pred_x0 = sample - sigma * model_output  # eps prediction
        derivative = (sample - pred_x0) / sigma
        self.derivatives.append(derivative)
        if len(self.derivatives) > order:
            self.derivatives.pop(0)
        order = min(step_index + 1, order)
        coeffs = [self.get_lms_coefficient(order, step_index, j)
                  for j in range(order)]
        return sample + sum(c * d for c, d in
                            zip(coeffs, reversed(self.derivatives)))


def test_lms_tables_match_quad_coefficients():
    cfg = SchedulerConfig()
    n = 12
    t_eval, sigmas, coeffs = L.lms_tables(cfg, n)
    mirror = _DiffusersLMSMirror(cfg, n)
    np.testing.assert_allclose(t_eval, mirror.timesteps, rtol=1e-6)
    np.testing.assert_allclose(sigmas, mirror.sigmas, rtol=2e-5, atol=1e-6)
    for i in range(n):
        order = min(i + 1, 4)
        want = [mirror.get_lms_coefficient(order, i, j)
                for j in range(order)]
        np.testing.assert_allclose(coeffs[i, :order], want, rtol=1e-7,
                                   atol=1e-12)
        # zero-padded beyond the active order
        assert (coeffs[i, order:] == 0).all()


def test_lms_matches_diffusers_mirror():
    cfg = SchedulerConfig()
    n = 10
    t_eval, sigmas, coeffs = L.lms_tables(cfg, n)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps_seq = [rng.randn(1, 4, 4, 4).astype(np.float32) for _ in range(n)]

    mirror = _DiffusersLMSMirror(cfg, n)
    xm = np.float64(1.0) * x
    for i in range(n):
        xm = mirror.step(eps_seq[i].astype(np.float64), i, xm)

    xj = jnp.asarray(x)
    state = L.init_state(xj)
    carr = jnp.asarray(coeffs, jnp.float32)
    for i in range(n):
        xj, state = L.lms_step(jnp.asarray(eps_seq[i]), jnp.asarray(i),
                               carr[i], xj, state)
    np.testing.assert_allclose(np.asarray(xj), xm, rtol=2e-4, atol=2e-4)


def test_lms_oracle_constant_eps_converges():
    """x = x0 + sigma*eps with constant eps: every interpolation
    polynomial is the constant eps, so LMS integrates exactly to x0."""
    cfg = SchedulerConfig()
    n = 8
    t_eval, sigmas, coeffs = L.lms_tables(cfg, n)
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)) * 0.5
    eps = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    x = x0 + float(sigmas[0]) * eps
    state = L.init_state(x)
    carr = jnp.asarray(coeffs, jnp.float32)
    for i in range(n):
        x, state = L.lms_step(eps, jnp.asarray(i), carr[i], x, state)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3,
                               atol=2e-3)


def test_scale_model_input():
    x = jnp.ones((1, 2, 2, 4))
    scaled = L.scale_model_input(x, jnp.asarray(3.0))
    np.testing.assert_allclose(np.asarray(scaled),
                               1.0 / np.sqrt(10.0), rtol=1e-6)
