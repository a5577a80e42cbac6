"""UNet structural + numerical property tests.

Covers (SURVEY.md §4's "shape/dtype property tests on the UNet"):
- both cycles (collect vs consume) numerically at a reduced size
- the 16 context keys and their shapes at 512px geometry (via eval_shape —
  trace-only, no FLOPs, so the full geometry is cheap to check)
- multi-ref kv concatenation
- parameter counts vs the known SD-1.5 + attn3 budget (via eval_shape)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.configs import UNetConfig
from storygen_tpu.models.unet import (CONTEXT_KEYS, UNet2DConditionModel,
                                      context_shapes, init_unet_params)

# compile-heavy lane: excluded from `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

# Small config: same topology, narrow channels -> fast CPU tests.
SMALL = UNetConfig(block_out_channels=(32, 64, 128, 128),
                   attention_head_dim=4, norm_num_groups=8,
                   cross_attention_dim=24)


def _param_count(model_init, *args):
    shapes = jax.eval_shape(model_init, jax.random.PRNGKey(0), *args)
    return sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))


@pytest.fixture(scope="module")
def small_unet():
    model = UNet2DConditionModel(config=SMALL)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 32, 32, 4))
    text = jnp.zeros((1, 7, 24))
    t = jnp.asarray([0])
    params = jax.jit(model.init)(rng, sample, t, text)
    return model, params


def test_reference_cycle_collects_16_keys_at_512px_geometry():
    """Shape-only check of the full 64x64-latent geometry via eval_shape."""
    model = UNet2DConditionModel(config=SMALL)
    sample = jnp.zeros((2, 64, 64, 4))
    text = jnp.zeros((2, 7, 24))
    t = jnp.asarray([0, 0])
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               sample, t, text)
    out_sd, ctx_sd = jax.eval_shape(
        lambda v: model.apply(v, sample, t, text), variables)
    assert out_sd.shape == (2, 64, 64, 4)
    assert set(ctx_sd.keys()) == set(CONTEXT_KEYS)
    assert len(CONTEXT_KEYS) == 16
    # seq lens follow the spatial pyramid (SURVEY.md §3.4: 4096/1024/256/64)
    assert ctx_sd["down_1_1"].shape == (2, 4096, 32)
    assert ctx_sd["down_3_2"].shape == (2, 256, 128)
    assert ctx_sd["mid"].shape == (2, 64, 128)
    assert ctx_sd["up_1_3"].shape == (2, 256, 128)
    assert ctx_sd["up_3_1"].shape == (2, 4096, 32)
    # helper agrees
    shapes = context_shapes(2, 64, num_refs=1)
    for k in CONTEXT_KEYS:
        assert tuple(ctx_sd[k].shape[:2]) == tuple(shapes[k][:2]), k


def test_image_cycle_consumes_multi_ref_context(small_unet):
    model, params = small_unet
    rng = np.random.RandomState(1)
    sample = jnp.asarray(rng.randn(1, 32, 32, 4), dtype=jnp.float32)
    text = jnp.asarray(rng.randn(1, 7, 24), dtype=jnp.float32)
    t = jnp.asarray([10])
    _, ctx = model.apply(params, sample, t, text)
    assert len(ctx) == 16
    # 3-ref concat on the sequence dim (pipeline.py:440-443)
    ctx3 = {k: jnp.concatenate([v, v, v], axis=1) for k, v in ctx.items()}
    out1, c1 = model.apply(params, sample, t, text, ctx)
    out3, _ = model.apply(params, sample, t, text, ctx3)
    assert out1.shape == out3.shape == (1, 32, 32, 4)
    assert c1 == {}  # image cycle collects nothing
    out_ref, _ = model.apply(params, sample, t, text)
    # attn3 branch changes the prediction
    assert not np.allclose(np.asarray(out1), np.asarray(out_ref), atol=1e-5)


def test_timestep_broadcast_scalar(small_unet):
    model, params = small_unet
    sample = jnp.zeros((1, 32, 32, 4))
    text = jnp.zeros((1, 7, 24))
    out_s, _ = model.apply(params, sample, jnp.asarray(5), text)
    out_b, _ = model.apply(params, sample, jnp.asarray([5]), text)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b), rtol=1e-6)


def test_full_size_param_count():
    """SD-1.5 UNet is ~859.5M params; attn3+norm4 add ~194.6M (derived:
    each of the 16 transformer blocks adds 4*C^2 + C (attn3 q/k/v no-bias,
    out with bias) + 2*C (norm4) at its width C)."""
    cfg = UNetConfig()
    model = UNet2DConditionModel(config=cfg)
    sample = jnp.zeros((1, 8, 8, 4))
    text = jnp.zeros((1, 77, 768))
    n = _param_count(model.init, sample, jnp.asarray([0]), text)
    widths = [320, 640, 1280] * 2 + [1280] + [1280, 640, 320] * 3
    attn3_plus_norm4 = sum(4 * c * c + 3 * c for c in widths)
    sd15 = 859_520_964
    assert n == sd15 + attn3_plus_norm4, (n, sd15 + attn3_plus_norm4)


def test_full_size_vae_clip_param_counts():
    from storygen_tpu.models.vae import AutoencoderKL
    from storygen_tpu.models.clip_text import CLIPTextModel
    vae = AutoencoderKL()
    rng = jax.random.PRNGKey(0)
    n_vae = _param_count(
        functools.partial(vae.init),
        jnp.zeros((1, 32, 32, 3)), rng)
    assert n_vae == 83_653_863, n_vae
    clip = CLIPTextModel()
    n_clip = _param_count(clip.init, jnp.zeros((1, 77), jnp.int32))
    assert n_clip == 123_060_480, n_clip


def test_bf16_forward(small_unet):
    model_bf16 = UNet2DConditionModel(config=SMALL, dtype=jnp.bfloat16)
    _, params = small_unet
    sample = jnp.ones((1, 32, 32, 4), jnp.bfloat16)
    text = jnp.ones((1, 7, 24), jnp.bfloat16)
    out, ctx = model_bf16.apply(params, sample, jnp.asarray(3), text)
    assert out.dtype == jnp.bfloat16
    assert not np.any(np.isnan(np.asarray(out, dtype=np.float32)))


def test_remat_variant_matches(small_unet):
    model, params = small_unet
    model_remat = UNet2DConditionModel(config=SMALL, remat=True)
    sample = jnp.ones((1, 32, 32, 4))
    text = jnp.ones((1, 7, 24))
    out, _ = model.apply(params, sample, jnp.asarray(3), text)
    out_r, _ = model_remat.apply(params, sample, jnp.asarray(3), text)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), rtol=1e-4,
                               atol=1e-5)
