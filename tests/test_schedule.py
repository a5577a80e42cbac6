"""Golden + property tests for the noise schedule (DDPM/DDIM).

Golden values are derived independently in numpy from the published
DDPM/DDIM equations at the reference operating point
(scaled_linear, 1000 steps, beta in [0.00085, 0.012]).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion import schedule as S


@pytest.fixture(scope="module")
def sched():
    return S.make_schedule(SchedulerConfig())


def _np_alphas_cumprod():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    return np.cumprod(1 - betas)


def test_alphas_cumprod_matches_numpy(sched):
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), _np_alphas_cumprod(), rtol=1e-6)
    # set_alpha_to_one=false -> final = alphas_cumprod[0]
    np.testing.assert_allclose(
        float(sched.final_alpha_cumprod), _np_alphas_cumprod()[0], rtol=1e-6)


def test_ddim_timesteps_leading_spacing():
    ts = S.ddim_timesteps(SchedulerConfig(), 50)
    # ratio 20, reversed, +1 offset: 981, 961, ..., 1
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)
    ts40 = S.ddim_timesteps(SchedulerConfig(), 40)
    assert ts40[0] == 976 and ts40[-1] == 1 and len(ts40) == 40


def test_add_noise_formula(sched):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    n = rng.randn(2, 8, 8, 4).astype(np.float32)
    t = np.array([10, 500])
    out = S.add_noise(sched, jnp.asarray(x), jnp.asarray(n), jnp.asarray(t))
    acp = _np_alphas_cumprod()[t][:, None, None, None]
    expected = np.sqrt(acp) * x + np.sqrt(1 - acp) * n
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_x0_recovery_exact(sched):
    """add_noise then pred_original_sample with true eps recovers x0."""
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    t = jnp.asarray([700])
    xt = S.add_noise(sched, x0, eps, t)
    rec_x0, rec_eps = S.pred_original_sample(sched, eps, t, xt)
    np.testing.assert_allclose(np.asarray(rec_x0), np.asarray(x0),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rec_eps), np.asarray(eps), rtol=1e-6)


def test_ddim_step_golden(sched):
    """DDIM eta=0 against a direct numpy transcription of the DDIM update."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    t, prev_t = 981, 961
    out = S.ddim_step(sched, jnp.asarray(eps), jnp.asarray(t),
                      jnp.asarray(prev_t), jnp.asarray(x))
    acp = _np_alphas_cumprod()
    a_t, a_prev = acp[t], acp[prev_t]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_ddim_last_step_uses_final_alpha(sched):
    """prev_t < 0 must select final_alpha_cumprod (set_alpha_to_one=false)."""
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    t, prev_t = 1, -19
    out = S.ddim_step(sched, jnp.asarray(eps), jnp.asarray(t),
                      jnp.asarray(prev_t), jnp.asarray(x))
    acp = _np_alphas_cumprod()
    a_t, a_prev = acp[t], acp[0]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_ddim_full_loop_denoises(sched):
    """Sampling with the true eps as model output converges towards x0."""
    rng = np.random.RandomState(4)
    x0 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)) * 0.5
    eps = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    ts = S.ddim_timesteps(SchedulerConfig(), 50)
    x = S.add_noise(sched, x0, eps, jnp.asarray(ts[0]))
    for i, t in enumerate(ts):
        prev_t = ts[i + 1] if i + 1 < len(ts) else t - 20
        x = S.ddim_step(sched, eps, jnp.asarray(t), jnp.asarray(int(prev_t)), x)
    # With the oracle eps the trajectory lands on sqrt(acp0) x0 +
    # sqrt(1-acp0) eps (set_alpha_to_one=false keeps ~3% residual noise).
    acp0 = _np_alphas_cumprod()[0]
    expected = np.sqrt(acp0) * np.asarray(x0) + np.sqrt(1 - acp0) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=2e-3)


def test_ddpm_step_posterior_golden(sched):
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    noise = rng.randn(1, 4, 4, 4).astype(np.float32)
    t = 500
    out = S.ddpm_step(sched, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(x),
                      jnp.asarray(noise))
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    acp = _np_alphas_cumprod()
    a_t, a_prev, b_t = acp[t], acp[t - 1], betas[t]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    mean = (np.sqrt(a_prev) * b_t / (1 - a_t) * x0
            + np.sqrt(1 - b_t) * (1 - a_prev) / (1 - a_t) * x)
    var = (1 - a_prev) / (1 - a_t) * b_t
    expected = mean + np.sqrt(var) * noise
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_jit_and_vmap_compatible(sched):
    """The schedule ops must trace under jit with traced timesteps."""
    @jax.jit
    def f(x, eps, t, prev_t):
        return S.ddim_step(sched, eps, t, prev_t, x)

    x = jnp.ones((1, 4, 4, 4))
    out = f(x, x * 0.1, jnp.asarray(981), jnp.asarray(961))
    assert out.shape == x.shape
