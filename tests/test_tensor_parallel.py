"""Tensor-parallel UNet: sharded-vs-replicated numerical equivalence on
the virtual 8-device mesh (2 data x 4 tensor)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.configs import UNetConfig
from storygen_tpu.models.unet import UNet2DConditionModel
from storygen_tpu.parallel import tensor as T

# channel widths divisible by tensor axis (4) with group alignment:
# groups=4 -> group sizes 8/16; 4-way shard of 32 -> 8 channels = 1 group
SMALL = UNetConfig(block_out_channels=(32, 64, 64, 64),
                   attention_head_dim=4, norm_num_groups=4,
                   cross_attention_dim=16)


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    model = UNet2DConditionModel(config=SMALL)
    params = jax.jit(model.init)(rng, jnp.zeros((2, 16, 16, 4)),
                                 jnp.asarray([0, 0]), jnp.zeros((2, 8, 16)))
    return model, params


def test_param_specs_shard_attention_and_ff(setup):
    _, params = setup
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(params["params"])
    specs = {p: T.unet_param_spec(p, np.shape(w)) for p, w in flat.items()}
    qk = [s for p, s in specs.items() if p[-2] == "to_q" and p[-1] == "kernel"]
    assert qk and all(s == ("data" not in s and s) for s in qk)
    assert all(s[1] == T.TENSOR_AXIS for s in qk)
    outp = [s for p, s in specs.items()
            if p[-2] == "to_out_0" and p[-1] == "kernel"]
    assert all(s[0] == T.TENSOR_AXIS for s in outp)
    conv1 = [s for p, s in specs.items()
             if p[-2] == "conv1" and p[-1] == "kernel" and "resnets" in
             "/".join(p)]
    assert conv1 and all(s[3] == T.TENSOR_AXIS for s in conv1)


def test_tp_forward_matches_replicated(setup):
    model, params = setup
    rng = np.random.RandomState(0)
    sample = jnp.asarray(rng.randn(2, 16, 16, 4), dtype=jnp.float32)
    text = jnp.asarray(rng.randn(2, 8, 16), dtype=jnp.float32)
    t = jnp.asarray([5, 5])

    base, ctx_base = model.apply(params, sample, t, text)

    mesh = T.make_tp_mesh(2, 4)
    params_tp = T.shard_unet_params(params, mesh)
    inputs = T.replicated_on(mesh, (sample, t, text))

    @jax.jit
    def fwd(p, s, tt, x):
        return model.apply(p, s, tt, x)

    out_tp, ctx_tp = fwd(params_tp, *inputs)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(base),
                               rtol=2e-4, atol=2e-5)
    for k in ctx_base:
        np.testing.assert_allclose(np.asarray(ctx_tp[k]),
                                   np.asarray(ctx_base[k]), rtol=2e-4,
                                   atol=2e-5, err_msg=k)


def test_tp_image_cycle_matches(setup):
    model, params = setup
    rng = np.random.RandomState(1)
    sample = jnp.asarray(rng.randn(2, 16, 16, 4), dtype=jnp.float32)
    text = jnp.asarray(rng.randn(2, 8, 16), dtype=jnp.float32)
    t = jnp.asarray([3, 3])
    _, ctx = model.apply(params, sample, t, text)
    base, _ = model.apply(params, sample, t, text, ctx)

    mesh = T.make_tp_mesh(2, 4)
    params_tp = T.shard_unet_params(params, mesh)
    sample_r, t_r, text_r = T.replicated_on(mesh, (sample, t, text))
    ctx_r = T.replicated_on(mesh, ctx)

    @jax.jit
    def fwd(p, s, tt, x, c):
        return model.apply(p, s, tt, x, c)

    out_tp, _ = fwd(params_tp, sample_r, t_r, text_r, ctx_r)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(base),
                               rtol=2e-4, atol=2e-5)


def test_tp_full_8way(setup):
    """1x8 mesh: GSPMD handles even the GN-straddling shards correctly."""
    model, params = setup
    rng = np.random.RandomState(2)
    sample = jnp.asarray(rng.randn(1, 16, 16, 4), dtype=jnp.float32)
    text = jnp.asarray(rng.randn(1, 8, 16), dtype=jnp.float32)
    t = jnp.asarray([7])
    base, _ = model.apply(params, sample, t, text)
    mesh = T.make_tp_mesh(1, 8)
    params_tp = T.shard_unet_params(params, mesh)
    inputs = T.replicated_on(mesh, (sample, t, text))
    out_tp, _ = jax.jit(model.apply)(params_tp, *inputs)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(base),
                               rtol=2e-4, atol=2e-5)
