"""Checkpoint interop tests: torch<->flax roundtrips, attn3 surgery,
orbax save/restore."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.checkpoint import hf_export, hf_import
from storygen_tpu.configs import UNetConfig, VAEConfig, CLIPTextConfig
from storygen_tpu.models.clip_text import CLIPTextModel
from storygen_tpu.models.unet import UNet2DConditionModel
from storygen_tpu.models.vae import AutoencoderKL

UNET_SMALL = UNetConfig(block_out_channels=(16, 32, 32, 32),
                        attention_head_dim=4, norm_num_groups=4,
                        cross_attention_dim=16)
VAE_SMALL = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                      norm_num_groups=2)
CLIP_SMALL = CLIPTextConfig(vocab_size=64, hidden_size=16,
                            intermediate_size=32, num_hidden_layers=1,
                            num_attention_heads=2, max_position_embeddings=8)


@pytest.fixture(scope="module")
def unet_params():
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(config=UNET_SMALL)
    return unet, jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 4)),
                                    jnp.asarray([0]), jnp.zeros((1, 8, 16)))


def test_unet_export_import_roundtrip(unet_params):
    unet, params = unet_params
    sd = hf_export.flax_to_torch_state_dict(params)
    # every torch tensor has the diffusers layout conventions
    assert "conv_in.weight" in sd and sd["conv_in.weight"].shape[2:] == (3, 3)
    key = ("down_blocks.0.attentions.0.transformer_blocks.0."
           "attn1.to_q.weight")
    assert key in sd and sd[key].ndim == 2
    assert "down_blocks.0.attentions.0.proj_in.weight" in sd
    assert sd["down_blocks.0.attentions.0.proj_in.weight"].ndim == 4
    back = hf_import.torch_to_flax_unet(sd, params, surgery=False)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(back),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_attn3_surgery_copies_attn1(unet_params):
    unet, params = unet_params
    sd = hf_export.flax_to_torch_state_dict(params)
    # simulate a vanilla SD checkpoint: drop attn3/norm4
    vanilla = {k: v for k, v in sd.items()
               if ".attn3." not in k and ".norm4." not in k}
    imported = hf_import.torch_to_flax_unet(vanilla, params, surgery=True)
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(imported["params"])
    for path, v in flat.items():
        if "attn3" in path:
            src = tuple(p.replace("attn3", "attn1") for p in path)
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(flat[src]), str(path))
        if "norm4" in path:
            src = tuple(p.replace("norm4", "norm1") for p in path)
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(flat[src]), str(path))


def test_vae_roundtrip_output_identical():
    rng = jax.random.PRNGKey(1)
    vae = AutoencoderKL(config=VAE_SMALL)
    params = jax.jit(vae.init)(rng, jnp.zeros((1, 32, 32, 3)), rng)
    sd = hf_export.flax_to_torch_state_dict(
        params, key_rewrites=hf_import.VAE_REWRITES)
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in sd
    back = hf_import.torch_to_flax_vae(sd, params)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                    dtype=jnp.float32)
    a = vae.apply(params, x, method=vae.encode).mean
    b = vae.apply(back, x, method=vae.encode).mean
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clip_roundtrip():
    rng = jax.random.PRNGKey(2)
    clip = CLIPTextModel(config=CLIP_SMALL)
    params = jax.jit(clip.init)(rng, jnp.zeros((1, 8), jnp.int32))
    sd = hf_export.flax_to_torch_state_dict(
        params, prefix="text_model.", key_rewrites=hf_import.CLIP_REWRITES)
    assert "text_model.embeddings.token_embedding.weight" in sd
    assert "text_model.encoder.layers.0.mlp.fc1.weight" in sd
    back = hf_import.torch_to_flax_clip(sd, params)
    ids = jnp.zeros((1, 8), jnp.int32)
    np.testing.assert_array_equal(np.asarray(clip.apply(params, ids)),
                                  np.asarray(clip.apply(back, ids)))


def test_orbax_save_restore(tmp_path, unet_params):
    import optax
    from storygen_tpu.checkpoint import orbax_io
    from storygen_tpu.training import optim, steps
    from storygen_tpu.configs import TrainConfig
    _, params = unet_params
    tx = optim.make_optimizer(TrainConfig(gradient_accumulation_steps=1))
    trainable, _ = optim.partition_params(
        params, optim.STAGE_PREDICATES["stage2"])
    state = steps.init_train_state(trainable, tx)
    p = orbax_io.save_checkpoint(str(tmp_path / "ckpt"), 42, state)
    assert os.path.isdir(p)
    assert orbax_io.latest_step(str(tmp_path / "ckpt")) == 42
    restored = orbax_io.restore_checkpoint(str(tmp_path / "ckpt"),
                                           {"state": state})
    a = jax.tree.leaves(state.trainable)[0]
    b = jax.tree.leaves(restored["state"].trainable)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_folder_level_roundtrip(tmp_path):
    """save_pretrained folder -> load_diffusers_pretrained reproduces the
    models end-to-end (configs + weights + scheduler)."""
    import json
    import dataclasses
    from storygen_tpu.checkpoint.hf_export import save_pretrained
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
    from storygen_tpu.configs import SchedulerConfig

    rng = jax.random.PRNGKey(3)
    unet = UNet2DConditionModel(config=UNET_SMALL)
    unet_params = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 4)),
                                     jnp.asarray([0]), jnp.zeros((1, 8, 16)))
    vae = AutoencoderKL(config=VAE_SMALL)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 32, 32, 3)), rng)
    clip = CLIPTextModel(config=CLIP_SMALL)
    clip_params = jax.jit(clip.init)(rng, jnp.zeros((1, 8), jnp.int32))

    root = str(tmp_path / "ckpt")
    save_pretrained(root, unet_params=unet_params, vae_params=vae_params,
                    clip_params=clip_params,
                    configs={"unet": UNET_SMALL, "vae": VAE_SMALL,
                             "clip": CLIP_SMALL})
    os.makedirs(os.path.join(root, "scheduler"), exist_ok=True)
    with open(os.path.join(root, "scheduler", "scheduler_config.json"),
              "w") as f:
        json.dump(dataclasses.asdict(SchedulerConfig()), f)

    bundle = load_diffusers_pretrained(root)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4),
                    dtype=jnp.float32)
    text = jnp.zeros((1, 8, 16))
    a, _ = unet.apply(unet_params, x, jnp.asarray([1]), text)
    b_, _ = bundle["unet"].apply(bundle["unet_params"], x, jnp.asarray([1]),
                                 text)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    ids = jnp.zeros((1, 8), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(clip.apply(clip_params, ids)),
        np.asarray(bundle["text_encoder"].apply(bundle["text_params"], ids)))
