"""Export flax params back to the HF/diffusers PyTorch folder layout.

Inverse of hf_import.py: lets checkpoints trained with this framework load
in the reference's `from_pretrained` stack (inference.py:44-48), preserving
the ecosystem interop of pipeline.save_pretrained
(train_StorySalon_stage2.py:348-357).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional

import numpy as np
from flax.traverse_util import flatten_dict

from storygen_tpu.checkpoint.hf_import import (_LEAF_RENAME,
                                               _flax_path_to_diffusers)
import re


def _deconvert_leaf(flax_path: tuple, w: np.ndarray,
                    to_1x1_conv: bool) -> np.ndarray:
    leaf = flax_path[-1]
    if leaf == "kernel":
        if w.ndim == 4:  # HWIO -> OIHW
            return w.transpose(3, 2, 0, 1)
        if w.ndim == 2:
            if to_1x1_conv:  # Dense that mirrors a torch 1x1 conv
                return w.T[:, :, None, None]
            return w.T
    return w


# flax Dense modules that are 1x1 convs in the torch layout
_CONV1X1_NAMES = {"proj_in", "proj_out"}


def flax_to_torch_state_dict(params: Any, prefix: str = "",
                             key_rewrites: Mapping[str, str] = {},
                             conv1x1_names=frozenset(_CONV1X1_NAMES),
                             ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for path, w in flatten_dict(params["params"]).items():
        dsegs = _flax_path_to_diffusers(path)
        key = prefix + ".".join(dsegs + (_LEAF_RENAME[path[-1]],))
        for pat, rep in key_rewrites.items():
            key = re.sub(pat, rep, key)
        to_1x1 = len(path) >= 2 and path[-2] in conv1x1_names
        out[key] = _deconvert_leaf(path, np.asarray(w), to_1x1)
    return out


def save_torch_bin(state_dict: Dict[str, np.ndarray], path: str) -> None:
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state_dict.items()}, path)


# diffusers version the exported config schema targets (the reference's
# pin, README.md:12-18 / environment.yaml).
_DIFFUSERS_VERSION = "0.13.1"


def diffusers_unet_config(cfg) -> Dict[str, Any]:
    """UNet config.json in the exact schema of
    ckpt/stable-diffusion-v1-5/unet/config.json (diffusers reads
    _class_name/_diffusers_version; sample_size is in pixels there)."""
    return {
        "_class_name": "UNet2DConditionModel",
        "_diffusers_version": _DIFFUSERS_VERSION,
        "act_fn": cfg.act_fn,
        "attention_head_dim": cfg.attention_head_dim,
        "block_out_channels": list(cfg.block_out_channels),
        "center_input_sample": False,
        "cross_attention_dim": cfg.cross_attention_dim,
        "down_block_types": list(cfg.down_block_types),
        "downsample_padding": cfg.downsample_padding,
        "flip_sin_to_cos": cfg.flip_sin_to_cos,
        "freq_shift": cfg.freq_shift,
        "in_channels": cfg.in_channels,
        "layers_per_block": cfg.layers_per_block,
        "mid_block_scale_factor": cfg.mid_block_scale_factor,
        "norm_eps": cfg.norm_eps,
        "norm_num_groups": cfg.norm_num_groups,
        "out_channels": cfg.out_channels,
        "sample_size": cfg.sample_size * 8,  # we store latent, HF pixels
        "up_block_types": list(cfg.up_block_types),
    }


def diffusers_vae_config(cfg) -> Dict[str, Any]:
    """ckpt/stable-diffusion-v1-5/vae/config.json schema."""
    n = len(cfg.block_out_channels)
    return {
        "_class_name": "AutoencoderKL",
        "_diffusers_version": _DIFFUSERS_VERSION,
        "act_fn": cfg.act_fn,
        "block_out_channels": list(cfg.block_out_channels),
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "in_channels": cfg.in_channels,
        "latent_channels": cfg.latent_channels,
        "layers_per_block": cfg.layers_per_block,
        "norm_num_groups": cfg.norm_num_groups,
        "out_channels": cfg.out_channels,
        "sample_size": cfg.sample_size,
        "scaling_factor": cfg.scaling_factor,
        "up_block_types": ["UpDecoderBlock2D"] * n,
    }


def diffusers_scheduler_config(cfg) -> Dict[str, Any]:
    """scheduler/scheduler_config.json the reference's
    DDIMScheduler.from_pretrained(subfolder='scheduler') opens
    (inference.py:48; field set of
    ckpt/stable-diffusion-v1-5/scheduler/scheduler_config.json)."""
    return {
        "_class_name": "DDIMScheduler",
        "_diffusers_version": _DIFFUSERS_VERSION,
        "beta_end": cfg.beta_end,
        "beta_schedule": cfg.beta_schedule,
        "beta_start": cfg.beta_start,
        "clip_sample": cfg.clip_sample,
        "num_train_timesteps": cfg.num_train_timesteps,
        "prediction_type": cfg.prediction_type,
        "set_alpha_to_one": cfg.set_alpha_to_one,
        "skip_prk_steps": True,
        "steps_offset": cfg.steps_offset,
        "trained_betas": None,
    }


def transformers_clip_config(cfg) -> Dict[str, Any]:
    """text_encoder/config.json a transformers
    CLIPTextModel.from_pretrained opens."""
    return {
        "architectures": ["CLIPTextModel"],
        "model_type": "clip_text_model",
        "attention_dropout": 0.0,
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": cfg.eos_token_id,
        "pad_token_id": cfg.pad_token_id,
        "hidden_act": cfg.hidden_act,
        "hidden_size": cfg.hidden_size,
        "initializer_factor": 1.0,
        "initializer_range": 0.02,
        "intermediate_size": cfg.intermediate_size,
        "layer_norm_eps": cfg.layer_norm_eps,
        "max_position_embeddings": cfg.max_position_embeddings,
        "num_attention_heads": cfg.num_attention_heads,
        "num_hidden_layers": cfg.num_hidden_layers,
        "projection_dim": 768,
        "torch_dtype": "float32",
        "vocab_size": cfg.vocab_size,
    }


MODEL_INDEX = {
    # component -> (library, class): the reference pipeline's folder root
    # (ckpt/stable-diffusion-v1-5/model_index.json; the scheduler entry is
    # DDIM because that is what the trained pipeline holds at save time,
    # inference.py:48 / train_StorySalon_stage2.py:349-357)
    "_class_name": "StableDiffusionPipeline",
    "_diffusers_version": _DIFFUSERS_VERSION,
    "scheduler": ["diffusers", "DDIMScheduler"],
    "text_encoder": ["transformers", "CLIPTextModel"],
    "tokenizer": ["transformers", "CLIPTokenizer"],
    "unet": ["diffusers", "UNet2DConditionModel"],
    "vae": ["diffusers", "AutoencoderKL"],
}


def save_pretrained(root: str, unet_params=None, vae_params=None,
                    clip_params=None, configs: Optional[dict] = None,
                    scheduler_config=None,
                    write_model_index: bool = True) -> None:
    """Write a diffusers-layout pipeline folder the reference stack can
    open: unet/ vae/ text_encoder/ with config.json + weight .bin,
    scheduler/scheduler_config.json, and model_index.json
    (inference.py:44-48 load stack). Component configs default to the
    SD-1.5 dataclass defaults when not provided."""
    from storygen_tpu.checkpoint.hf_import import CLIP_REWRITES, VAE_REWRITES
    from storygen_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                      UNetConfig, VAEConfig)

    def dump(sub, fname, payload):
        os.makedirs(os.path.join(root, sub) if sub else root, exist_ok=True)
        with open(os.path.join(root, sub, fname) if sub
                  else os.path.join(root, fname), "w") as f:
            json.dump(payload, f, indent=2)

    configs = configs or {}
    if unet_params is not None:
        os.makedirs(os.path.join(root, "unet"), exist_ok=True)
        sd = flax_to_torch_state_dict(unet_params)
        save_torch_bin(sd, os.path.join(root, "unet",
                                        "diffusion_pytorch_model.bin"))
        dump("unet", "config.json",
             diffusers_unet_config(configs.get("unet") or UNetConfig()))
    if vae_params is not None:
        os.makedirs(os.path.join(root, "vae"), exist_ok=True)
        sd = flax_to_torch_state_dict(vae_params, key_rewrites=VAE_REWRITES)
        save_torch_bin(sd, os.path.join(root, "vae",
                                        "diffusion_pytorch_model.bin"))
        dump("vae", "config.json",
             diffusers_vae_config(configs.get("vae") or VAEConfig()))
    if clip_params is not None:
        os.makedirs(os.path.join(root, "text_encoder"), exist_ok=True)
        sd = flax_to_torch_state_dict(clip_params, prefix="text_model.",
                                      key_rewrites=CLIP_REWRITES)
        save_torch_bin(sd, os.path.join(root, "text_encoder",
                                        "pytorch_model.bin"))
        dump("text_encoder", "config.json",
             transformers_clip_config(configs.get("clip")
                                      or CLIPTextConfig()))
    dump("scheduler", "scheduler_config.json",
         diffusers_scheduler_config(scheduler_config or SchedulerConfig()))
    if write_model_index:
        dump("", "model_index.json", MODEL_INDEX)
