"""DPM-Solver++(2M) tests: oracle convergence and pipeline integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion import dpm_solver as D
from storygen_tpu.diffusion import schedule as S


def test_oracle_eps_converges_to_x0_few_steps():
    """With the true eps as model output, DPM++(2M) at 10 steps should
    land closer to x0 than the same-step DDIM trajectory's noise floor."""
    cfg = SchedulerConfig()
    sched = S.make_schedule(cfg)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)) * 0.5
    eps = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    ts = S.ddim_timesteps(cfg, 10)
    x = S.add_noise(sched, x0, eps, jnp.asarray(ts[0]))
    state = D.init_state(x)
    for i, t in enumerate(ts):
        prev_t = ts[i + 1] if i + 1 < len(ts) else -1
        x, state = D.dpmpp_2m_step(sched, eps, jnp.asarray(int(t)),
                                   jnp.asarray(int(prev_t)), x, state)
    # final step returns the data prediction = exact x0 with oracle eps
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3,
                               atol=2e-3)


def test_second_order_term_engages():
    cfg = SchedulerConfig()
    sched = S.make_schedule(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    st0 = D.init_state(x)
    x1, st1 = D.dpmpp_2m_step(sched, eps, jnp.asarray(981),
                              jnp.asarray(881), x, st0)
    assert int(st1.prev_t) == 981
    # second call with different prev_x0 changes the output (2nd order)
    st_alt = D.DPMState(prev_x0=st1.prev_x0 + 1.0, prev_t=st1.prev_t)
    x2a, _ = D.dpmpp_2m_step(sched, eps, jnp.asarray(881),
                             jnp.asarray(781), x1, st1)
    x2b, _ = D.dpmpp_2m_step(sched, eps, jnp.asarray(881),
                             jnp.asarray(781), x1, st_alt)
    assert not np.allclose(np.asarray(x2a), np.asarray(x2b))


@pytest.mark.slow
def test_pipeline_sampler_option():
    from storygen_tpu.configs import UNetConfig, VAEConfig
    from storygen_tpu.models.unet import UNet2DConditionModel
    from storygen_tpu.models.vae import AutoencoderKL
    from storygen_tpu.pipeline import StoryGenSampler
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(config=UNetConfig(
        block_out_channels=(16, 32, 32, 32), attention_head_dim=4,
        norm_num_groups=4, cross_attention_dim=16))
    up = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([0]),
                            jnp.zeros((1, 4, 16)))
    vae = AutoencoderKL(config=VAEConfig(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1,
        norm_num_groups=2))
    vp = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    sampler = StoryGenSampler(unet, vae)
    params = {"unet": up, "vae": vp}
    lat = jax.random.normal(rng, (1, 8, 8, 4))
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16))
    noise = jnp.zeros((1, 8, 8, 4))
    kw = dict(stage="no", num_inference_steps=4)
    o_ddim = sampler.sample(params, lat, text * 0, text, None, None, None,
                            None, noise, jnp.asarray(5.0), jnp.asarray(3.5),
                            sampler="ddim", **kw)
    o_dpm = sampler.sample(params, lat, text * 0, text, None, None, None,
                           None, noise, jnp.asarray(5.0), jnp.asarray(3.5),
                           sampler="dpm++", **kw)
    assert o_ddim.shape == o_dpm.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(o_dpm)).all()
    assert not np.allclose(np.asarray(o_ddim), np.asarray(o_dpm))


@pytest.mark.slow
def test_dpm_with_refs():
    """DPM++ sampler through the full reference-conditioned loop."""
    from storygen_tpu.configs import UNetConfig, VAEConfig
    from storygen_tpu.models.unet import UNet2DConditionModel
    from storygen_tpu.models.vae import AutoencoderKL
    from storygen_tpu.pipeline import StoryGenSampler
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(config=UNetConfig(
        block_out_channels=(16, 32, 32, 32), attention_head_dim=4,
        norm_num_groups=4, cross_attention_dim=16))
    up = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([0]),
                            jnp.zeros((1, 4, 16)))
    vae = AutoencoderKL(config=VAEConfig(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1,
        norm_num_groups=2))
    vp = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    sampler = StoryGenSampler(unet, vae)
    params = {"unet": up, "vae": vp}
    ks = jax.random.split(rng, 6)
    b, n = 1, 2
    def text(i):
        return jax.random.normal(jax.random.PRNGKey(i), (b, 4, 16))
    out = sampler.sample(
        params, jax.random.normal(ks[0], (b, 8, 8, 4)), text(1), text(2),
        jax.random.normal(ks[1], (n, b, 8, 8, 4)) * 0.2,
        jnp.zeros((b, 8, 8, 4)),
        jnp.stack([text(10 + i) for i in range(n)]),
        jnp.stack([text(20 + i) for i in range(n)]),
        jax.random.normal(ks[2], (b, 8, 8, 4)), jnp.asarray(7.0),
        jnp.asarray(3.5), stage="auto-regressive", num_inference_steps=4,
        sampler="dpm++")
    assert out.shape == (b, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
