"""Chained two-stage workflow (VERDICT r4 missing #2).

The reference's PRIMARY training story is stage 2 initialized FROM the
stage-1 checkpoint: config/stage2_config.yml sets pretrained_model_path
to the stage-1 logdir and train_StorySalon_stage2.py:143-148 loads the
UNet from it (attn1 trained in stage 1; attn3 surgery-filled only when
the checkpoint predates the VLCM heads, unet_2d_condition.py:487-510).

This file pins the chain on tiny models: stage-1 train -> diffusers
export -> stage-2 build_models(pretrained_model_path=<export>) ->
trained attn1 survives the roundtrip bitwise; attn3 surgery fires only
when the export lacks attn3 keys; and the stage-2 driver trains its
attn3 subtree end-to-end from that folder.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from storygen_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                  TrainConfig, UNetConfig, VAEConfig)
from storygen_tpu.models.clip_text import CLIPTextModel
from storygen_tpu.models.unet import UNet2DConditionModel
from storygen_tpu.models.vae import AutoencoderKL
from storygen_tpu.training.trainer import build_models, train

from tests.test_trainer import SynthDataset, fake_tokenizer

pytestmark = pytest.mark.slow

UNET_CFG = UNetConfig(block_out_channels=(16, 32, 32, 32),
                      attention_head_dim=4, norm_num_groups=4,
                      cross_attention_dim=16)
VAE_CFG = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                    norm_num_groups=2)
CLIP_CFG = CLIPTextConfig(vocab_size=64, hidden_size=16,
                          intermediate_size=32, num_hidden_layers=1,
                          num_attention_heads=2,
                          max_position_embeddings=8)


def _bundle_with_configs():
    """test_trainer._bundle, but carrying the tiny configs so the
    trainer's diffusers export writes config.jsons the stage-2 re-import
    can rebuild the same tiny models from."""
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(config=UNET_CFG)
    unet_params = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 4)),
                                     jnp.asarray([0]),
                                     jnp.zeros((1, 8, 16)))
    vae = AutoencoderKL(config=VAE_CFG)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    clip = CLIPTextModel(config=CLIP_CFG)
    clip_params = jax.jit(clip.init)(rng, jnp.zeros((1, 8), jnp.int32))
    return dict(unet=unet, unet_params=unet_params, unet_config=UNET_CFG,
                vae=vae, vae_params=vae_params, vae_config=VAE_CFG,
                text_encoder=clip, text_params=clip_params,
                clip_config=CLIP_CFG, scheduler_config=SchedulerConfig())


def _leaves(params, want):
    return {k: np.asarray(v) for k, v in
            flatten_dict(params["params"]).items()
            if any(want in s for s in k)}


def _maxdiff(a, b):
    assert a.keys() == b.keys()
    return max(float(np.abs(a[k].astype(np.float64)
                            - b[k].astype(np.float64)).max())
               for k in a)


def test_chained_stage1_to_stage2(tmp_path):
    stage1_dir = os.path.join(str(tmp_path), "stage1_log")
    cfg1 = TrainConfig(logdir=stage1_dir, train_steps=2,
                       train_batch_size=2, gradient_accumulation_steps=1,
                       checkpointing_steps=2, validation_steps=1000,
                       learning_rate=1e-2,  # move attn1 macroscopically
                       mixed_precision="fp32", mesh_shape=(1,),
                       pretrained_model_path="")
    bundle = _bundle_with_configs()
    init_attn1 = _leaves(bundle["unet_params"], "attn1")
    init_attn3 = _leaves(bundle["unet_params"], "attn3")
    ds = SynthDataset()
    state1 = train(stage="stage1", config=cfg1, dataset=ds,
                   tokenizer=fake_tokenizer, models_bundle=bundle)
    export = os.path.join(stage1_dir, "checkpoint_2")
    assert os.path.isdir(os.path.join(export, "unet"))

    # --- stage 2 init from the stage-1 export (the reference chain:
    # config/stage2_config.yml pretrained_model_path: "./stage1_log/")
    cfg2 = TrainConfig(logdir=os.path.join(str(tmp_path), "stage2_log"),
                       train_steps=2, train_batch_size=2,
                       gradient_accumulation_steps=1,
                       checkpointing_steps=1000, validation_steps=1000,
                       learning_rate=1e-2, mixed_precision="fp32",
                       mesh_shape=(1,), pretrained_model_path=export)
    bundle2 = build_models(cfg2)
    got_attn1 = _leaves(bundle2["unet_params"], "attn1")
    got_attn3 = _leaves(bundle2["unet_params"], "attn3")

    # stage 1 trained attn1 (and ONLY attn1 reached the optimizer)
    assert _maxdiff(got_attn1, init_attn1) > 1e-4, \
        "attn1 did not train in stage 1"
    np.testing.assert_array_equal(
        np.concatenate([v.ravel() for _, v in sorted(got_attn3.items())]),
        np.concatenate([v.ravel() for _, v in sorted(init_attn3.items())]),
        err_msg="attn3 moved during stage 1 (must be frozen)")
    # the trained attn1 survives export -> re-import BITWISE (fp32 .bin,
    # no surgery fires: the export carries real attn3 keys). state1's
    # trainable subtree IS the trained attn1.
    trained_attn1 = _leaves(state1.trainable, "attn1")
    for k, v in got_attn1.items():
        np.testing.assert_array_equal(
            v, trained_attn1[k],
            err_msg=f"trained attn1 leaf {k} corrupted by the roundtrip")

    # --- stage 2 trains its attn3 subtree end-to-end from the folder
    state2 = train(stage="stage2", config=cfg2, dataset=ds,
                   tokenizer=fake_tokenizer)
    assert int(state2.step) == 2
    final_attn3 = _leaves(state2.trainable, "attn3")
    assert _maxdiff(final_attn3,
                    {k: got_attn3[k] for k in final_attn3}) > 1e-4, \
        "attn3 did not train in stage 2"


def test_attn3_surgery_fires_only_when_absent(tmp_path):
    """Vanilla-SD semantics: strip attn3/norm4 from an exported unet and
    re-import -> attn3 := attn1, norm4 := norm1 (the reference's
    load_SDM_state_dict copy, unet_2d_condition.py:501-506). With the
    keys present, the stored attn3 loads untouched."""
    import torch
    from storygen_tpu.checkpoint import hf_export
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained

    bundle = _bundle_with_configs()
    root = os.path.join(str(tmp_path), "export")
    hf_export.save_pretrained(
        root, unet_params=bundle["unet_params"],
        vae_params=bundle["vae_params"], clip_params=bundle["text_params"],
        configs={"unet": UNET_CFG, "vae": VAE_CFG, "clip": CLIP_CFG},
        scheduler_config=bundle["scheduler_config"])

    # present -> loads untouched, and attn3 != attn1 at random init
    loaded = load_diffusers_pretrained(root)
    a1 = _leaves(loaded["unet_params"], "attn1")
    a3 = _leaves(loaded["unet_params"], "attn3")
    np.testing.assert_array_equal(
        np.concatenate([v.ravel() for _, v in sorted(a3.items())]),
        np.concatenate([v.ravel() for _, v in sorted(
            _leaves(bundle["unet_params"], "attn3").items())]))
    assert _maxdiff(a3, {k3: a1[tuple(
        s.replace("attn3", "attn1") for s in k3)] for k3 in a3}) > 1e-4

    # absent -> surgery fills attn3 from attn1, norm4 from norm1
    bin_path = os.path.join(root, "unet", "diffusion_pytorch_model.bin")
    sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    stripped = {k: v for k, v in sd.items()
                if ".attn3." not in k and not (
                    ".norm4." in k and "transformer_blocks" in k)}
    assert len(stripped) < len(sd)
    torch.save(stripped, bin_path)
    loaded2 = load_diffusers_pretrained(root)
    a1b = _leaves(loaded2["unet_params"], "attn1")
    a3b = _leaves(loaded2["unet_params"], "attn3")
    for k3, v3 in a3b.items():
        k1 = tuple(s.replace("attn3", "attn1") for s in k3)
        np.testing.assert_array_equal(v3, a1b[k1],
                                      err_msg=f"surgery missed {k3}")
    n1 = _leaves(loaded2["unet_params"], "norm1")
    for k4, v4 in _leaves(loaded2["unet_params"], "norm4").items():
        k1 = tuple(s.replace("norm4", "norm1") for s in k4)
        if k1 in n1:  # transformer-block norms only
            np.testing.assert_array_equal(v4, n1[k1])
