"""UNet down/mid/up blocks threading the VLCM image context.

Capability parity with model/unet_2d_blocks.py, re-designed functionally:
the reference's two stateful code paths per block ("reference cycle" that
collects features at unet_2d_blocks.py:383-396 vs "image cycle" that
consumes them at :397-428) become a single apply function whose
`image_context` argument is either None (collect) or a dict pytree
(consume). jit specializes each case into its own executable.

Context keying: the reference derives keys from the latent spatial size at
block entry ("down_{ln}_{i+1}" with ln = 4 - H//16, unet_2d_blocks.py:380-381;
"up_{ln}_{i+1}" with ln = H//16 clamped, :600-601; "mid", :291). That scheme
collides below 64x64 latents. Here keys derive from the *block index*
instead — resolution-independent and collision-free — which reproduces the
reference names exactly at the 512px operating point (down_1..3_{1,2}, mid,
up_1..3_{1,2,3}).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from storygen_tpu.models.attention import Transformer2DModel
from storygen_tpu.models.layers import (Downsample2D, ResnetBlock2D,
                                        Upsample2D)

Dtype = Any
Context = Dict[str, jax.Array]


def _gate_mask(ref_mask: Optional[jax.Array],
               ctx: Optional[jax.Array]) -> Optional[jax.Array]:
    """Pass the (B, N) per-ref mask through only when a context exists."""
    return None if ctx is None else ref_mask


def down_block_key(block_idx: int, layer_idx: int) -> str:
    return f"down_{block_idx + 1}_{layer_idx + 1}"


def up_block_key(block_idx: int, layer_idx: int) -> str:
    return f"up_{block_idx}_{layer_idx + 1}"


class UNetMidBlock2D(nn.Module):
    """Plain (non-cross) mid block: resnet -> self-attn -> resnet
    (unet_2d_blocks.py:119-194; present for API parity — the SD-1.5
    config uses UNetMidBlock2DCrossAttn)."""
    in_channels: int
    resnet_groups: int = 32
    resnet_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array,
                 temb: jax.Array) -> jax.Array:
        from storygen_tpu.models.vae import VAEAttentionBlock
        hidden_states = ResnetBlock2D(
            self.in_channels, groups=self.resnet_groups,
            eps=self.resnet_eps, dtype=self.dtype,
            name="resnets_0")(hidden_states, temb)
        hidden_states = VAEAttentionBlock(
            self.in_channels, groups=self.resnet_groups, dtype=self.dtype,
            name="attentions_0")(hidden_states)
        hidden_states = ResnetBlock2D(
            self.in_channels, groups=self.resnet_groups,
            eps=self.resnet_eps, dtype=self.dtype,
            name="resnets_1")(hidden_states, temb)
        return hidden_states


class CrossAttnDownBlock2D(nn.Module):
    """[Resnet -> Transformer2D] x layers -> Downsample
    (unet_2d_blocks.py:300-436)."""
    out_channels: int
    block_idx: int = 0
    num_layers: int = 2
    num_heads: int = 8
    cross_attention_dim: int = 768
    resnet_groups: int = 32
    resnet_eps: float = 1e-5
    add_downsample: bool = True
    downsample_padding: int = 1
    dtype: Dtype = jnp.float32
    attn_backend: Optional[str] = None
    attn_variant: Optional[str] = None

    @nn.compact
    def __call__(self, hidden_states: jax.Array, temb: jax.Array,
                 encoder_hidden_states: jax.Array,
                 image_context: Optional[Context] = None,
                 ref_mask: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, Tuple[jax.Array, ...], Context]:
        collected: Context = {}
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = ResnetBlock2D(
                self.out_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, dtype=self.dtype,
                name=f"resnets_{i}")(hidden_states, temb)
            key = down_block_key(self.block_idx, i)
            img_ctx = None if image_context is None else image_context[key]
            hidden_states, tap = Transformer2DModel(
                self.num_heads, self.out_channels // self.num_heads,
                in_channels=self.out_channels,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups, dtype=self.dtype,
                attn_backend=self.attn_backend,
                attn_variant=self.attn_variant,
                name=f"attentions_{i}")(hidden_states, encoder_hidden_states,
                                        img_ctx,
                                        _gate_mask(ref_mask, img_ctx))
            if image_context is None:
                collected[key] = tap
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0")(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states, collected


class DownBlock2D(nn.Module):
    """Resnet-only down block (unet_2d_blocks.py:439-515)."""
    out_channels: int
    num_layers: int = 2
    resnet_groups: int = 32
    resnet_eps: float = 1e-5
    add_downsample: bool = True
    downsample_padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array, temb: jax.Array,
                 ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = ResnetBlock2D(
                self.out_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, dtype=self.dtype,
                name=f"resnets_{i}")(hidden_states, temb)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, padding=self.downsample_padding,
                dtype=self.dtype, name="downsamplers_0")(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlock2DCrossAttn(nn.Module):
    """Resnet -> Transformer2D -> Resnet (unet_2d_blocks.py:197-297)."""
    in_channels: int
    num_heads: int = 8
    cross_attention_dim: int = 768
    resnet_groups: int = 32
    resnet_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    attn_backend: Optional[str] = None
    attn_variant: Optional[str] = None

    @nn.compact
    def __call__(self, hidden_states: jax.Array, temb: jax.Array,
                 encoder_hidden_states: jax.Array,
                 image_context: Optional[Context] = None,
                 ref_mask: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, Context]:
        hidden_states = ResnetBlock2D(
            self.in_channels, groups=self.resnet_groups, eps=self.resnet_eps,
            dtype=self.dtype, name="resnets_0")(hidden_states, temb)
        img_ctx = None if image_context is None else image_context["mid"]
        hidden_states, tap = Transformer2DModel(
            self.num_heads, self.in_channels // self.num_heads,
            in_channels=self.in_channels,
            cross_attention_dim=self.cross_attention_dim,
            norm_num_groups=self.resnet_groups, dtype=self.dtype,
            attn_backend=self.attn_backend,
            attn_variant=self.attn_variant,
            name="attentions_0")(hidden_states, encoder_hidden_states, img_ctx,
                                 _gate_mask(ref_mask, img_ctx))
        hidden_states = ResnetBlock2D(
            self.in_channels, groups=self.resnet_groups, eps=self.resnet_eps,
            dtype=self.dtype, name="resnets_1")(hidden_states, temb)
        collected = {} if image_context is not None else {"mid": tap}
        return hidden_states, collected


class CrossAttnUpBlock2D(nn.Module):
    """[concat-skip -> Resnet -> Transformer2D] x layers -> Upsample
    (unet_2d_blocks.py:518-660)."""
    out_channels: int
    block_idx: int = 1
    num_layers: int = 3
    num_heads: int = 8
    cross_attention_dim: int = 768
    resnet_groups: int = 32
    resnet_eps: float = 1e-5
    add_upsample: bool = True
    dtype: Dtype = jnp.float32
    attn_backend: Optional[str] = None
    attn_variant: Optional[str] = None

    @nn.compact
    def __call__(self, hidden_states: jax.Array,
                 res_hidden_states_tuple: Tuple[jax.Array, ...],
                 temb: jax.Array, encoder_hidden_states: jax.Array,
                 image_context: Optional[Context] = None,
                 ref_mask: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, Context]:
        collected: Context = {}
        for i in range(self.num_layers):
            res = res_hidden_states_tuple[-(i + 1)]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = ResnetBlock2D(
                self.out_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, dtype=self.dtype,
                name=f"resnets_{i}")(hidden_states, temb)
            key = up_block_key(self.block_idx, i)
            img_ctx = None if image_context is None else image_context[key]
            hidden_states, tap = Transformer2DModel(
                self.num_heads, self.out_channels // self.num_heads,
                in_channels=self.out_channels,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.resnet_groups, dtype=self.dtype,
                attn_backend=self.attn_backend,
                attn_variant=self.attn_variant,
                name=f"attentions_{i}")(hidden_states, encoder_hidden_states,
                                        img_ctx,
                                        _gate_mask(ref_mask, img_ctx))
            if image_context is None:
                collected[key] = tap
        if self.add_upsample:
            hidden_states = Upsample2D(self.out_channels, dtype=self.dtype,
                                       name="upsamplers_0")(hidden_states)
        return hidden_states, collected


class UpBlock2D(nn.Module):
    """Resnet-only up block (unet_2d_blocks.py:663-733)."""
    out_channels: int
    num_layers: int = 3
    resnet_groups: int = 32
    resnet_eps: float = 1e-5
    add_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array,
                 res_hidden_states_tuple: Tuple[jax.Array, ...],
                 temb: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            res = res_hidden_states_tuple[-(i + 1)]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = ResnetBlock2D(
                self.out_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, dtype=self.dtype,
                name=f"resnets_{i}")(hidden_states, temb)
        if self.add_upsample:
            hidden_states = Upsample2D(self.out_channels, dtype=self.dtype,
                                       name="upsamplers_0")(hidden_states)
        return hidden_states
