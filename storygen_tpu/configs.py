"""Typed configuration for StoryGen-TPU.

Mirrors the reference's component configs so that published StoryGen /
SD-1.5 checkpoints and YAML train configs load directly:

- UNet:      /root/reference/ckpt/stable-diffusion-v1-5/unet/config.json
- VAE:       /root/reference/ckpt/stable-diffusion-v1-5/vae/config.json
- Scheduler: /root/reference/ckpt/stable-diffusion-v1-5/scheduler/scheduler_config.json
- CLIP text: /root/reference/ckpt/stable-diffusion-v1-5/CLIP/config.json (text_config)
- Training:  /root/reference/config/{stage1,stage2,COCO}_config.yml
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple


def _filter_kwargs(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass(frozen=True)
class UNetConfig:
    """SD-1.5 UNet + StoryGen VLCM (attn3) config.

    Reference: model/unet_2d_condition.py:84-117 (defaults) and
    ckpt/stable-diffusion-v1-5/unet/config.json (operating point).
    """
    sample_size: int = 64  # latent H=W (512px / 8)
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    mid_block_type: Optional[str] = "UNetMidBlock2DCrossAttn"
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # In the reference this is named attention_head_dim but is used as the
    # *number of heads* (unet_2d_blocks.py:239-241: Transformer2DModel(
    # attn_num_head_channels, in_channels // attn_num_head_channels, ...)).
    attention_head_dim: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    downsample_padding: int = 1
    mid_block_scale_factor: float = 1.0
    act_fn: str = "silu"
    use_linear_projection: bool = False
    conv_in_kernel: int = 3
    conv_out_kernel: int = 3

    @property
    def num_heads(self) -> int:
        return self.attention_head_dim

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @classmethod
    def from_json(cls, path: str) -> "UNetConfig":
        with open(path) as f:
            d = json.load(f)
        for k in ("down_block_types", "up_block_types", "block_out_channels"):
            if k in d:
                d[k] = tuple(d[k])
        if d.get("sample_size", 64) > 128:
            # diffusers stores pixel sample_size for SD-1.5 (512); we keep latent.
            d["sample_size"] = d["sample_size"] // 8
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL config (ckpt/stable-diffusion-v1-5/vae/config.json)."""
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    sample_size: int = 512
    act_fn: str = "silu"
    scaling_factor: float = 0.18215  # model/pipeline.py:393,402 (x * 0.18215)

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def from_json(cls, path: str) -> "VAEConfig":
        with open(path) as f:
            d = json.load(f)
        if "block_out_channels" in d:
            d["block_out_channels"] = tuple(d["block_out_channels"])
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP ViT-L/14 text encoder (CLIP/config.json text_config)."""
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    bos_token_id: int = 49406
    eos_token_id: int = 49407
    pad_token_id: int = 49407

    @classmethod
    def from_json(cls, path: str) -> "CLIPTextConfig":
        with open(path) as f:
            d = json.load(f)
        if "text_config" in d:
            d = d["text_config"]
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class SchedulerConfig:
    """Noise schedule (ckpt/stable-diffusion-v1-5/scheduler/scheduler_config.json)."""
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    clip_sample: bool = False
    prediction_type: str = "epsilon"

    @classmethod
    def from_json(cls, path: str) -> "SchedulerConfig":
        with open(path) as f:
            d = json.load(f)
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class TrainConfig:
    """Flat training config mirroring reference config/*.yml keys
    (e.g. config/stage2_config.yml) plus TPU-specific knobs."""
    pretrained_model_path: str = "./ckpt/stable-diffusion-v1-5/"
    logdir: str = "./logs/"
    dataset_path: str = "./StorySalon/"
    dataset_name: str = "all"
    # Optional scripts/precompute_latents.py output dir: when set, the
    # trainer reads VAE posterior moments + token ids instead of pixels
    # (the BENCH.md-recommended regime; the step samples the posterior
    # per iteration, so training stochasticity is preserved).
    latents_path: Optional[str] = None
    train_steps: int = 50000
    train_batch_size: int = 12
    val_batch_size: int = 1
    gradient_accumulation_steps: int = 8
    validation_steps: int = 500
    checkpointing_steps: int = 5000
    # diffusers-folder export cadence; None -> every checkpointing_steps.
    # The export is a multi-GB host conversion (minutes of loop stall);
    # set high to keep only cheap orbax saves in-loop and export offline
    # (scripts/export_checkpoint.py).
    export_steps: Optional[int] = None
    seed: int = 6666
    mixed_precision: str = "bf16"  # reference fp16; bf16 is the TPU policy
    learning_rate: float = 1e-5
    scale_lr: bool = False
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    use_8bit_adam: bool = False  # optax AdamW; quantized state optional
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 0.01
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    num_ref_frames: int = 3
    # TPU-specific
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)
    remat: bool = True
    attn_backend: Optional[str] = None  # None='auto' (flash when it wins)
    # Flash forward variant: "bnd_guard" (default) runs the fast
    # stats-free bounded kernel with a free domain check that falls back
    # to the exact online-softmax kernel whenever logits could leave the
    # bound's exp2 range — unconditionally exact, so it is safe even for
    # diverging runs. "online_t" forces the exact kernel; "bnd" is the
    # raw bounded kernel (no guard; silently zeroes attention rows
    # out-of-domain — benchmarking only).
    attn_variant: str = "bnd_guard"
    loader_threads: int = 8
    validation_sample_logger: Optional[dict] = None
    # Tokenizer folder override (vocab/merges); defaults to
    # <pretrained_model_path>/tokenizer — set explicitly when training
    # from random init (no pretrained folder to point into).
    tokenizer_path: Optional[str] = None

    def __post_init__(self):
        # validate at parse time, not deep inside a jitted call
        if self.attn_variant not in ("bnd_guard", "bnd", "online_t",
                                     "grid"):
            raise ValueError(
                f"attn_variant={self.attn_variant!r}; expected one of "
                "'bnd_guard', 'bnd', 'online_t', 'grid'")
        if self.attn_backend not in (None, "auto", "flash", "xla"):
            raise ValueError(
                f"attn_backend={self.attn_backend!r}; expected None, "
                "'auto', 'flash' or 'xla'")
        # "fp16" = the reference YAMLs' AMP flag; on TPU it maps to bf16
        if self.mixed_precision not in ("bf16", "fp16", "fp32", "no"):
            raise ValueError(
                f"mixed_precision={self.mixed_precision!r}; expected "
                "'bf16', 'fp16' (treated as bf16), 'fp32' or 'no'")

    @classmethod
    def from_yaml(cls, path: str) -> "TrainConfig":
        import yaml
        with open(path) as f:
            d = yaml.safe_load(f)
        if "mesh_shape" in d:
            d["mesh_shape"] = tuple(d["mesh_shape"])
        if "mesh_axes" in d:
            d["mesh_axes"] = tuple(d["mesh_axes"])
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)
class PipelineConfig:
    """Inference operating point (model/pipeline.py:273-294 defaults)."""
    num_inference_steps: int = 50
    guidance_scale: float = 7.5
    image_guidance_scale: float = 3.5
    height: int = 512
    width: int = 512
    num_ref_frames: int = 3
    eta: float = 0.0


def load_pretrained_configs(root: str):
    """Load all component configs from a diffusers-layout folder."""
    unet = UNetConfig.from_json(os.path.join(root, "unet", "config.json"))
    vae = VAEConfig.from_json(os.path.join(root, "vae", "config.json"))
    sched = SchedulerConfig.from_json(
        os.path.join(root, "scheduler", "scheduler_config.json"))
    clip_path = os.path.join(root, "text_encoder", "config.json")
    if not os.path.exists(clip_path):
        clip_path = os.path.join(root, "CLIP", "config.json")
    clip = CLIPTextConfig.from_json(clip_path)
    return unet, vae, clip, sched
