"""VAE structural/numerical tests.

Shapes, 8x downscale, KL sampling determinism, encode/decode pipeline with
the 0.18215 scaling exactly as used at model/pipeline.py:386-404,198-205.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# compile-heavy lane: excluded from `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

from storygen_tpu.configs import VAEConfig
from storygen_tpu.models.vae import AutoencoderKL, DiagonalGaussian

SMALL = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                  norm_num_groups=4, latent_channels=4)


@pytest.fixture(scope="module")
def vae():
    model = AutoencoderKL(config=SMALL)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(rng, x, rng)
    return model, params


def test_encode_shapes_8x(vae):
    model, params = vae
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    dtype=jnp.float32)
    dist = model.apply(params, x, method=model.encode)
    assert dist.mean.shape == (2, 8, 8, 4)
    assert dist.logvar.shape == (2, 8, 8, 4)


def test_decode_shapes(vae):
    model, params = vae
    z = jnp.zeros((2, 8, 8, 4))
    img = model.apply(params, z, method=model.decode)
    assert img.shape == (2, 64, 64, 3)


def test_sample_deterministic_per_key(vae):
    model, params = vae
    x = jnp.ones((1, 64, 64, 3))
    dist = model.apply(params, x, method=model.encode)
    k = jax.random.PRNGKey(7)
    s1, s2 = dist.sample(k), dist.sample(k)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    s3 = dist.sample(jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(s1), np.asarray(s3))


def test_kl_of_standard_normal_is_zero():
    d = DiagonalGaussian(mean=jnp.zeros((2, 4, 4, 4)),
                         logvar=jnp.zeros((2, 4, 4, 4)))
    np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-6)


def test_scaling_roundtrip(vae):
    """Latents scale by 0.18215 after encode, divide before decode."""
    model, params = vae
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    dist = model.apply(params, x, method=model.encode)
    latents = dist.mode() * SMALL.scaling_factor
    img = model.apply(params, latents / SMALL.scaling_factor,
                      method=model.decode)
    img_direct = model.apply(params, dist.mode(), method=model.decode)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_direct),
                               rtol=1e-4, atol=1e-5)


def test_full_size_param_count():
    """SD-1.5 VAE has 83.65M params (eval_shape: no compute)."""
    model = AutoencoderKL()
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(model.init, rng, jnp.zeros((1, 32, 32, 3)), rng)
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))
    assert n == 83_653_863, n
