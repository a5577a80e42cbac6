"""CLIP text encoder golden test vs transformers (torch CPU).

The strongest parity check available in-sandbox: a randomly initialized
torch CLIPTextModel's weights are imported through checkpoint/hf_import.py
and outputs compared elementwise.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from storygen_tpu.configs import CLIPTextConfig
from storygen_tpu.models.clip_text import CLIPTextModel, init_clip_params
from storygen_tpu.checkpoint.hf_import import torch_to_flax_clip

SMALL = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=16)


@pytest.fixture(scope="module")
def torch_clip():
    import transformers
    tcfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu")
    torch_model = transformers.CLIPTextModel(tcfg).eval()
    return torch_model


def test_matches_transformers(torch_clip):
    import torch
    sd = {k: v.numpy() for k, v in torch_clip.state_dict().items()}
    model, tmpl = init_clip_params(jax.random.PRNGKey(0), SMALL)
    params = torch_to_flax_clip(sd, tmpl)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 100, size=(2, 16)).astype(np.int32)
    ours = model.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        theirs = torch_clip(torch.from_numpy(ids).long()).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_causal_mask_active():
    model, params = init_clip_params(jax.random.PRNGKey(1), SMALL)
    ids = jnp.zeros((1, 16), jnp.int32)
    base = model.apply(params, ids)
    # changing a late token must not affect early positions
    ids2 = ids.at[0, 10].set(5)
    out2 = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(base[0, :10]),
                               np.asarray(out2[0, :10]), atol=1e-6)
    assert not np.allclose(np.asarray(base[0, 10:]), np.asarray(out2[0, 10:]))


def test_full_size_param_count():
    """CLIP ViT-L/14 text encoder: 123.06M params (eval_shape: no compute)."""
    model = CLIPTextModel()
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 77), jnp.int32))
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))
    assert n == 123_060_480, n
