"""Euler / Euler-ancestral sampler tests (oracle convergence, sigma math)."""
import jax.numpy as jnp
import numpy as np

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion import euler as E
from storygen_tpu.diffusion import schedule as S


def _setup():
    cfg = SchedulerConfig()
    return cfg, S.make_schedule(cfg)


def test_sigma_relation():
    cfg, sched = _setup()
    t = jnp.asarray([1, 500, 981])
    sigma = E.sigma_of(sched, t)
    acp = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
    np.testing.assert_allclose(np.asarray(sigma),
                               np.sqrt((1 - acp) / acp), rtol=1e-5)


def test_euler_oracle_converges():
    """x_t = x0 + sigma*eps; with eps as the model output the Euler
    trajectory reaches exactly x0 at sigma=0."""
    cfg, sched = _setup()
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    ts = S.ddim_timesteps(cfg, 20)
    x = x0 + E.sigma_of(sched, jnp.asarray(int(ts[0]))) * eps
    for i, t in enumerate(ts):
        prev_t = int(ts[i + 1]) if i + 1 < len(ts) else -1
        x = E.euler_step(sched, eps, jnp.asarray(int(t)),
                         jnp.asarray(prev_t), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4,
                               atol=1e-5)


def test_ancestral_reduces_to_euler_when_noise_zero_at_last_step():
    cfg, sched = _setup()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    out = E.euler_ancestral_step(sched, eps, jnp.asarray(100),
                                 jnp.asarray(-1), x, jnp.zeros_like(x))
    expected = E.euler_step(sched, eps, jnp.asarray(100), jnp.asarray(-1), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5)


def test_scale_model_input():
    cfg, sched = _setup()
    x = jnp.ones((1, 2, 2, 4))
    t = jnp.asarray(500)
    scaled = E.scale_model_input(sched, x, t)
    sigma = float(E.sigma_of(sched, t))
    np.testing.assert_allclose(np.asarray(scaled),
                               1.0 / np.sqrt(sigma ** 2 + 1), rtol=1e-5)
