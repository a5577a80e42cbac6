"""Import HF/diffusers-layout PyTorch checkpoints into flax pytrees.

Capability parity with the reference's checkpoint loading:
- `from_pretrained(subfolder=...)` folder layout (inference.py:44-48)
- the attn3/norm4-from-attn1/norm1 weight surgery of
  model/unet_2d_condition.py:487-510 (`apply_attn3_surgery`)

Conversions torch -> flax/NHWC:
- conv weight OIHW -> HWIO
- 1x1 conv used as Dense (proj_in/proj_out, quant convs stay convs)
- linear weight (O, I) -> kernel (I, O)
- norm weight -> scale
- embedding weight -> embedding
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin (torch pickle) or .safetensors file to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def find_weight_file(folder: str) -> str:
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin",
                 "model.safetensors", "pytorch_model.bin"):
        p = os.path.join(folder, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weight file in {folder}")


def apply_attn3_surgery(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fill missing attn3/norm4 weights from attn1/norm1.

    Mirrors load_SDM_state_dict (unet_2d_condition.py:501-506): when loading
    a vanilla SD checkpoint that lacks the VLCM image-cross-attention, attn3
    starts as a copy of the self-attention and norm4 of norm1. attn3's kv
    dim equals the query dim, so attn1 weights are shape-compatible.
    """
    out = dict(sd)
    for k in list(sd.keys()):
        if ".attn1." in k:
            k3 = k.replace(".attn1.", ".attn3.")
            if k3 not in out:
                out[k3] = sd[k]
        if ".norm1." in k and "transformer_blocks" in k:
            k4 = k.replace(".norm1.", ".norm4.")
            if k4 not in out:
                out[k4] = sd[k]
    return out


def _flax_path_to_diffusers(path: tuple) -> tuple:
    """Map a flax param path to the diffusers dotted key (sans leaf rename).

    flax list-modules are named `name_{i}`; diffusers uses `name.{i}`.
    Special cases: samplers contain a bare conv in diffusers
    (`downsamplers.0.conv`), `to_out_0` -> `to_out.0`, ff `net_0/net_2`.
    """
    segs = []
    for s in path[:-1]:
        m = re.fullmatch(r"(.+?)_(\d+)", s)
        if m and m.group(1) in (
                "down_blocks", "up_blocks", "resnets", "attentions",
                "transformer_blocks", "downsamplers", "upsamplers",
                "layers", "to_out", "net"):
            segs.extend([m.group(1), m.group(2)])
        else:
            segs.append(s)
    return tuple(segs)


def _convert_leaf(flax_path: tuple, torch_w: np.ndarray,
                  target_shape: tuple) -> np.ndarray:
    leaf = flax_path[-1]
    w = torch_w
    if leaf == "kernel":
        if w.ndim == 4:
            if len(target_shape) == 2:  # 1x1 conv -> Dense
                w = w[:, :, 0, 0].T
            else:  # OIHW -> HWIO
                w = w.transpose(2, 3, 1, 0)
        elif w.ndim == 2:
            w = w.T
    elif leaf == "scale":
        pass  # norm weight
    elif leaf == "embedding":
        pass
    if tuple(w.shape) != tuple(target_shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(flax_path)}: torch {torch_w.shape} "
            f"-> {w.shape}, expected {target_shape}")
    return w


_LEAF_RENAME = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "embedding": "weight"}


def convert_state_dict(sd: Mapping[str, np.ndarray], params_template: Any,
                       prefix: str = "",
                       key_rewrites: Mapping[str, str] = {}) -> Any:
    """Fill a flax params template from a torch state dict.

    Args:
      sd: flat torch state dict (numpy values).
      params_template: flax params pytree (shapes/dtypes to match).
      prefix: prepended to every generated diffusers key
        (e.g. "text_model." for CLIP).
      key_rewrites: regex -> replacement applied to generated keys.
    """
    flat = flatten_dict(params_template["params"])
    out = {}
    for path, target in flat.items():
        dsegs = _flax_path_to_diffusers(path)
        leaf = _LEAF_RENAME[path[-1]]
        key = prefix + ".".join(dsegs + (leaf,))
        for pat, rep in key_rewrites.items():
            key = re.sub(pat, rep, key)
        if key not in sd:
            raise KeyError(f"{key} (for flax {'/'.join(path)}) not in "
                           f"state dict; sample keys: "
                           f"{list(sd.keys())[:5]}")
        w = _convert_leaf(path, np.asarray(sd[key]), np.shape(target))
        out[path] = jnp.asarray(w, dtype=jnp.asarray(target).dtype)
    return {"params": unflatten_dict(out)}


# --- per-model entry points -------------------------------------------------

UNET_REWRITES = {
    # Downsample2D/Upsample2D wrap their conv: flax .../downsamplers.0.conv
    # already matches diffusers. Transformer norms keep their names.
    r"\btime_embedding\.linear_(\d)\.": r"time_embedding.linear_\1.",
}

VAE_REWRITES = {
    # VAE samplers in this codebase are bare convs named downsamplers_0:
    r"\bdownsamplers\.0\.(weight|bias)$": r"downsamplers.0.conv.\1",
    r"\bupsamplers\.0\.(weight|bias)$": r"upsamplers.0.conv.\1",
}

CLIP_REWRITES = {
    r"^text_model\.layers\.": "text_model.encoder.layers.",
    r"^text_model\.(token|position)_embedding\.":
        r"text_model.embeddings.\1_embedding.",
    r"\.fc([12])\.": r".mlp.fc\1.",
}


def torch_to_flax_unet(sd, params_template, surgery: bool = True):
    if surgery:
        sd = apply_attn3_surgery(sd)
    return convert_state_dict(sd, params_template)


def torch_to_flax_vae(sd, params_template):
    return convert_state_dict(sd, params_template,
                              key_rewrites=VAE_REWRITES)


def torch_to_flax_clip(sd, params_template):
    return convert_state_dict(sd, params_template, prefix="text_model.",
                              key_rewrites=CLIP_REWRITES)


def load_diffusers_pretrained(root: str, dtype=jnp.float32):
    """Load a full diffusers-layout checkpoint folder into flax models.

    Returns dict with models, params and configs for unet/vae/text_encoder.
    Equivalent of the reference's component loads at inference.py:44-48.
    """
    from storygen_tpu.configs import load_pretrained_configs
    from storygen_tpu.models.clip_text import CLIPTextModel, init_clip_params
    from storygen_tpu.models.unet import init_unet_params
    from storygen_tpu.models.vae import AutoencoderKL

    import jax
    unet_cfg, vae_cfg, clip_cfg, sched_cfg = load_pretrained_configs(root)
    rng = jax.random.PRNGKey(0)

    unet, unet_tmpl = init_unet_params(rng, unet_cfg, dtype=dtype)
    unet_params = torch_to_flax_unet(
        load_torch_state_dict(find_weight_file(os.path.join(root, "unet"))),
        unet_tmpl)

    vae = AutoencoderKL(config=vae_cfg, dtype=dtype)
    vae_tmpl = jax.jit(vae.init)(
        rng, jnp.zeros((1, 32, 32, vae_cfg.in_channels)), rng,
    )
    vae_params = torch_to_flax_vae(
        load_torch_state_dict(find_weight_file(os.path.join(root, "vae"))),
        vae_tmpl)

    clip, clip_tmpl = init_clip_params(rng, clip_cfg, dtype=dtype)
    te_dir = os.path.join(root, "text_encoder")
    if not os.path.isdir(te_dir):
        te_dir = os.path.join(root, "CLIP")
    clip_params = torch_to_flax_clip(
        load_torch_state_dict(find_weight_file(te_dir)), clip_tmpl)

    return dict(unet=unet, unet_params=unet_params, unet_config=unet_cfg,
                vae=vae, vae_params=vae_params, vae_config=vae_cfg,
                text_encoder=clip, text_params=clip_params,
                clip_config=clip_cfg, scheduler_config=sched_cfg)
