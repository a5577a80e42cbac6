"""Trainer driver smoke test: a few optimizer steps end-to-end on tiny
models + synthetic dataset, with checkpointing and resume."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from storygen_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                  TrainConfig, UNetConfig, VAEConfig)
from storygen_tpu.models.clip_text import CLIPTextModel
from storygen_tpu.models.unet import UNet2DConditionModel
from storygen_tpu.models.vae import AutoencoderKL
from storygen_tpu.training.trainer import train
import pytest

# compile-heavy lane: excluded from `pytest -m 'not slow'`
pytestmark = pytest.mark.slow



class SynthDataset:
    def __init__(self, n=8, img=64):
        self.n, self.img = n, img
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.RandomState(i)
        return {
            "image": r.randn(self.img, self.img, 3).astype(np.float32) * .2,
            "mask": (r.rand(self.img, self.img, 1) > 0.8).astype(np.float32),
            "prompt": f"story frame {i}",
            "ref_images": r.randn(3, self.img, self.img, 3).astype(
                np.float32) * 0.2,
            "ref_prompts": [f"prev {j}" for j in range(3)],
        }


def fake_tokenizer(texts):
    return np.asarray([[hash(t) % 64 for _ in range(8)] for t in texts],
                      np.int32)


def _bundle():
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(config=UNetConfig(
        block_out_channels=(16, 32, 32, 32), attention_head_dim=4,
        norm_num_groups=4, cross_attention_dim=16))
    unet_params = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 4)),
                                     jnp.asarray([0]),
                                     jnp.zeros((1, 8, 16)))
    vae = AutoencoderKL(config=VAEConfig(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1,
        norm_num_groups=2))
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    clip = CLIPTextModel(config=CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=8))
    clip_params = jax.jit(clip.init)(rng, jnp.zeros((1, 8), jnp.int32))
    return dict(unet=unet, unet_params=unet_params,
                unet_config=None, vae=vae, vae_params=vae_params,
                vae_config=None, text_encoder=clip,
                text_params=clip_params, clip_config=None,
                scheduler_config=SchedulerConfig())


def test_train_smoke_and_resume(tmp_path):
    cfg = TrainConfig(logdir=str(tmp_path), train_steps=3,
                      train_batch_size=2, gradient_accumulation_steps=1,
                      checkpointing_steps=2, validation_steps=1000,
                      mixed_precision="fp32", mesh_shape=(1,),
                      pretrained_model_path="")
    bundle = _bundle()
    ds = SynthDataset()
    state = train(stage="stage2", config=cfg, dataset=ds,
                  tokenizer=fake_tokenizer, models_bundle=bundle)
    assert int(state.step) == 3
    # orbax checkpoint written at step 2 and hf export folder exists
    assert os.path.isdir(os.path.join(str(tmp_path), "orbax", "2"))
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoint_2"))
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.jsonl"))
    # resume: extends to 5 steps starting from the saved state
    cfg2 = TrainConfig(logdir=str(tmp_path), train_steps=5,
                       train_batch_size=2, gradient_accumulation_steps=1,
                       checkpointing_steps=100, validation_steps=1000,
                       mixed_precision="fp32", mesh_shape=(1,),
                       pretrained_model_path="")
    state2 = train(stage="stage2", config=cfg2, dataset=ds,
                   tokenizer=fake_tokenizer, models_bundle=bundle)
    assert int(state2.step) == 5


def test_validation_sampling_uses_live_params(tmp_path):
    """The SampleLogger must render from the TRAINED model (the reference
    samples the live pipeline, train_StorySalon_stage2.py:338-347): with a
    fixed sampling rng and a single val sample, images at different steps
    differ only through the trained attn3 subtree."""
    from PIL import Image
    cfg = TrainConfig(logdir=str(tmp_path), train_steps=2,
                      train_batch_size=2, gradient_accumulation_steps=1,
                      checkpointing_steps=1000, validation_steps=1,
                      learning_rate=1e-2,  # move attn3 macroscopically
                      mixed_precision="fp32", mesh_shape=(1,),
                      pretrained_model_path="",
                      validation_sample_logger=dict(
                          stage="auto-regressive", num_inference_steps=2,
                          guidance_scale=7.0, height=64, width=64))
    bundle = _bundle()
    ds = SynthDataset()
    val = SynthDataset(n=1)
    train(stage="stage2", config=cfg, dataset=ds, val_dataset=val,
          tokenizer=fake_tokenizer, models_bundle=bundle)
    p1 = os.path.join(str(tmp_path), "samples", "step1_0.png")
    p2 = os.path.join(str(tmp_path), "samples", "step2_0.png")
    assert os.path.exists(p1) and os.path.exists(p2)
    a1 = np.asarray(Image.open(p1)).astype(np.int32)
    a2 = np.asarray(Image.open(p2)).astype(np.int32)
    assert np.abs(a1 - a2).max() > 0, \
        "validation samples identical across steps: stale pipeline params"
