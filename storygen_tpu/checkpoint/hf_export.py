"""Export flax params back to the HF/diffusers PyTorch folder layout.

Inverse of hf_import.py: lets checkpoints trained with this framework load
in the reference's `from_pretrained` stack (inference.py:44-48), preserving
the ecosystem interop of pipeline.save_pretrained
(train_StorySalon_stage2.py:348-357).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

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


def save_pretrained(root: str, unet_params=None, vae_params=None,
                    clip_params=None, configs: Optional[dict] = None) -> None:
    """Write a diffusers-layout folder (unet/vae/text_encoder subdirs with
    config.json + diffusion_pytorch_model.bin)."""
    from storygen_tpu.checkpoint.hf_import import CLIP_REWRITES, VAE_REWRITES
    import dataclasses

    def dump_cfg(sub, cfg):
        if cfg is None:
            return
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        with open(os.path.join(root, sub, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)

    configs = configs or {}
    if unet_params is not None:
        os.makedirs(os.path.join(root, "unet"), exist_ok=True)
        sd = flax_to_torch_state_dict(unet_params)
        save_torch_bin(sd, os.path.join(root, "unet",
                                        "diffusion_pytorch_model.bin"))
        dump_cfg("unet", configs.get("unet"))
    if vae_params is not None:
        os.makedirs(os.path.join(root, "vae"), exist_ok=True)
        sd = flax_to_torch_state_dict(vae_params, key_rewrites=VAE_REWRITES)
        save_torch_bin(sd, os.path.join(root, "vae",
                                        "diffusion_pytorch_model.bin"))
        dump_cfg("vae", configs.get("vae"))
    if clip_params is not None:
        os.makedirs(os.path.join(root, "text_encoder"), exist_ok=True)
        sd = flax_to_torch_state_dict(clip_params, prefix="text_model.",
                                      key_rewrites=CLIP_REWRITES)
        save_torch_bin(sd, os.path.join(root, "text_encoder",
                                        "pytorch_model.bin"))
        dump_cfg("text_encoder", configs.get("clip"))
