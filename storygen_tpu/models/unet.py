"""StoryGen conditional UNet: SD-1.5 UNet + VLCM image-context plumbing.

Capability parity with model/unet_2d_condition.py:
- forward(sample, timestep, encoder_hidden_states, image_context) ->
  (eps_prediction, img_dif_conditions) (:338-485)
- 4 down blocks (320/640/1280/1280, CrossAttn x3 + plain), mid cross-attn
  block, 4 up blocks (plain + CrossAttn x3) (:91-100)
- 16 collected context features per reference pass, keyed
  down_{1..3}_{1,2} / mid / up_{1..3}_{1..3} (:427-470)

TPU-first re-design:
- Pure flax module over NHWC latents; both cycles (collect when
  image_context is None, consume otherwise) are the same function, jit
  specializes each.
- `remat` wraps each block in jax.checkpoint to keep the two-phase
  training step (reference forwards + main forward) inside HBM, the TPU
  equivalent of unet_2d_blocks.py:400-418's torch.utils.checkpoint.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from storygen_tpu.ops.shift_conv import SConv
import jax
import jax.numpy as jnp

from storygen_tpu.configs import UNetConfig
from storygen_tpu.models.layers import (GroupNorm, TimestepEmbedding,
                                        get_timestep_embedding)
from storygen_tpu.models import unet_blocks as B

Dtype = Any
Context = Dict[str, jax.Array]

# The 16 context keys produced by a 512px reference pass
# (unet_2d_condition.py:427-470).
CONTEXT_KEYS = tuple(
    [f"down_{i}_{j}" for i in (1, 2, 3) for j in (1, 2)] + ["mid"]
    + [f"up_{i}_{j}" for i in (1, 2, 3) for j in (1, 2, 3)])


def context_shapes(batch: int, latent_hw: int = 64,
                   num_refs: int = 1) -> Dict[str, Tuple[int, int, int]]:
    """Static (B, S*num_refs, C) shapes of the VLCM context at a given
    latent resolution; S halves per level, C follows block widths."""
    widths = (320, 640, 1280)
    shapes = {}
    for lvl, c in enumerate(widths):
        s = (latent_hw // (2 ** lvl)) ** 2
        for j in (1, 2):
            shapes[f"down_{lvl + 1}_{j}"] = (batch, s * num_refs, c)
    shapes["mid"] = (batch, (latent_hw // 8) ** 2 * num_refs, 1280)
    up_widths = (1280, 640, 320)
    for idx, c in enumerate(up_widths):
        s = (latent_hw // (2 ** (2 - idx))) ** 2
        for j in (1, 2, 3):
            shapes[f"up_{idx + 1}_{j}"] = (batch, s * num_refs, c)
    return shapes


class UNet2DConditionModel(nn.Module):
    config: UNetConfig = UNetConfig()
    dtype: Dtype = jnp.float32
    remat: bool = False
    attn_backend: Optional[str] = None
    attn_variant: Optional[str] = None

    @nn.compact
    def __call__(self, sample: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array,
                 image_context: Optional[Context] = None,
                 ref_mask: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, Context]:
        """Args:
          sample: (B, H, W, 4) noisy latents, NHWC.
          timesteps: scalar or (B,) int/float timesteps.
          encoder_hidden_states: (B, 77, 768) CLIP text features.
          image_context: None (reference cycle: collect) or dict of
            (B, S_layer * n_refs, C_layer) (image cycle: consume).
          ref_mask: optional (B, n_refs) booleans selecting which reference
            frames attn3 may attend to (static-shape equivalent of the
            reference's random 1-3 ref training,
            train_StorySalon_stage2.py:306-318).
        Returns (eps_prediction (B, H, W, 4), collected context dict).
        """
        cfg = self.config
        b = sample.shape[0]

        # 1. time embedding (fp32 sinusoid -> MLP in compute dtype)
        ts = jnp.asarray(timesteps)
        if ts.ndim == 0:
            ts = jnp.broadcast_to(ts, (b,))
        t_emb = get_timestep_embedding(
            ts, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift)
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                 name="time_embedding")(
            t_emb.astype(self.dtype))

        # 2. conv_in
        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)
        p = (cfg.conv_in_kernel - 1) // 2
        sample = SConv(cfg.block_out_channels[0],
                         (cfg.conv_in_kernel, cfg.conv_in_kernel),
                         padding=((p, p), (p, p)), dtype=self.dtype,
                         name="conv_in")(sample)

        def maybe_remat(cls):
            if not self.remat:
                return cls
            return nn.remat(cls, static_argnums=(), prevent_cse=False)

        collected: Context = {}
        down_res: Tuple[jax.Array, ...] = (sample,)

        # 3. down
        out_ch = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if block_type == "CrossAttnDownBlock2D":
                blk = maybe_remat(B.CrossAttnDownBlock2D)(
                    out_channels=out_ch, block_idx=i,
                    num_layers=cfg.layers_per_block,
                    num_heads=cfg.num_heads,
                    cross_attention_dim=cfg.cross_attention_dim,
                    resnet_groups=cfg.norm_num_groups,
                    resnet_eps=cfg.norm_eps, add_downsample=not is_final,
                    downsample_padding=cfg.downsample_padding,
                    dtype=self.dtype, attn_backend=self.attn_backend,
                                      attn_variant=self.attn_variant,
                    name=f"down_blocks_{i}")
                sample, res, taps = blk(sample, temb, encoder_hidden_states,
                                        image_context, ref_mask)
                collected.update(taps)
            elif block_type == "DownBlock2D":
                blk = maybe_remat(B.DownBlock2D)(
                    out_channels=out_ch, num_layers=cfg.layers_per_block,
                    resnet_groups=cfg.norm_num_groups,
                    resnet_eps=cfg.norm_eps, add_downsample=not is_final,
                    downsample_padding=cfg.downsample_padding,
                    dtype=self.dtype, name=f"down_blocks_{i}")
                sample, res = blk(sample, temb)
            else:
                raise ValueError(block_type)
            down_res += res

        # 4. mid
        if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
            sample, taps = maybe_remat(B.UNetMidBlock2DCrossAttn)(
                in_channels=cfg.block_out_channels[-1],
                num_heads=cfg.num_heads,
                cross_attention_dim=cfg.cross_attention_dim,
                resnet_groups=cfg.norm_num_groups, resnet_eps=cfg.norm_eps,
                dtype=self.dtype, attn_backend=self.attn_backend,
                                  attn_variant=self.attn_variant,
                name="mid_block")(sample, temb, encoder_hidden_states,
                                  image_context, ref_mask)
            collected.update(taps)

        # 5. up
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            is_final = i == len(cfg.up_block_types) - 1
            n_layers = cfg.layers_per_block + 1
            res = down_res[-n_layers:]
            down_res = down_res[:-n_layers]
            if block_type == "CrossAttnUpBlock2D":
                blk = maybe_remat(B.CrossAttnUpBlock2D)(
                    out_channels=out_ch, block_idx=i,
                    num_layers=n_layers,
                    num_heads=cfg.num_heads,
                    cross_attention_dim=cfg.cross_attention_dim,
                    resnet_groups=cfg.norm_num_groups,
                    resnet_eps=cfg.norm_eps, add_upsample=not is_final,
                    dtype=self.dtype, attn_backend=self.attn_backend,
                                      attn_variant=self.attn_variant,
                    name=f"up_blocks_{i}")
                sample, taps = blk(sample, res, temb, encoder_hidden_states,
                                   image_context, ref_mask)
                collected.update(taps)
            elif block_type == "UpBlock2D":
                sample = maybe_remat(B.UpBlock2D)(
                    out_channels=out_ch, num_layers=n_layers,
                    resnet_groups=cfg.norm_num_groups,
                    resnet_eps=cfg.norm_eps, add_upsample=not is_final,
                    dtype=self.dtype, name=f"up_blocks_{i}")(
                    sample, res, temb)
            else:
                raise ValueError(block_type)

        # 6. out
        sample = GroupNorm(cfg.norm_num_groups, cfg.norm_eps,
                           dtype=self.dtype, act="silu",
                           name="conv_norm_out")(sample)
        p = (cfg.conv_out_kernel - 1) // 2
        sample = SConv(cfg.out_channels,
                         (cfg.conv_out_kernel, cfg.conv_out_kernel),
                         padding=((p, p), (p, p)), dtype=self.dtype,
                         name="conv_out")(sample)
        return sample, collected


def init_unet_params(rng: jax.Array, config: UNetConfig = UNetConfig(),
                     latent_hw: int = 16, dtype=jnp.float32):
    """Initialize UNet params.

    Parameters are resolution-independent (convs + channel-axis denses), so
    init runs at a small latent size for speed; the same pytree serves
    any input resolution.
    """
    model = UNet2DConditionModel(config=config, dtype=dtype)
    sample = jnp.zeros((1, latent_hw, latent_hw, config.in_channels), dtype)
    text = jnp.zeros((1, 77, config.cross_attention_dim), dtype)
    t = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(model.init)(rng, sample, t, text)
    return model, variables
