"""AutoencoderKL: VAE encoder/decoder with KL latent sampling.

Capability parity with the diffusers AutoencoderKL the reference imports
(model/pipeline.py:16, used at pipeline.py:386-404 for ref-frame encoding
and :198-205 for decoding; config ckpt/stable-diffusion-v1-5/vae/config.json:
block_out_channels (128,256,512,512), layers_per_block 2, latent_channels 4).

TPU-first: NHWC convs, fp32 GroupNorm stats, single-head attention in the
mid block expressed as one fused matmul chain. The encoder's downsample
convs use the reference's asymmetric (0,1) input padding so that imported
SD-1.5 VAE weights reproduce identical latents.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn

from storygen_tpu.ops.shift_conv import SConv
import jax
import jax.numpy as jnp

from storygen_tpu.configs import VAEConfig
from storygen_tpu.models.layers import GroupNorm

Dtype = Any


class VAEResnetBlock(nn.Module):
    """Resnet block without time embedding (VAE variant, eps 1e-6)."""
    out_channels: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # Folded GN + SConv prologue: the SiLU-affine fuses into the halo
        # conv's VMEM slab at eligible sites (the VAE decoder's 512px
        # stride-1 convs are the biggest halo winners, BENCH.md) — see
        # models/layers.py::ResnetBlock2D for the pattern.
        in_channels = x.shape[-1]
        a1, s1 = GroupNorm(self.groups, 1e-6, dtype=self.dtype,
                           fold_affine=True, name="norm1")(x)
        h = SConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                  dtype=self.dtype, name="conv1")(x, prologue=(a1, s1))
        a2, s2 = GroupNorm(self.groups, 1e-6, dtype=self.dtype,
                           fold_affine=True, name="norm2")(h)
        if in_channels != self.out_channels:
            x = SConv(self.out_channels, (1, 1), padding="VALID",
                        dtype=self.dtype, name="conv_shortcut")(x)
        return SConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                     dtype=self.dtype, name="conv2")(
                         h, prologue=(a2, s2), residual=x)


class VAEAttentionBlock(nn.Module):
    """Single-head self-attention over spatial tokens (diffusers
    AttentionBlock as used in the VAE mid blocks)."""
    channels: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.groups, 1e-6, dtype=self.dtype,
                      name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="query")(y)
        k = nn.Dense(c, dtype=self.dtype, name="key")(y)
        v = nn.Dense(c, dtype=self.dtype, name="value")(y)
        scale = c ** -0.5
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        y = jnp.einsum("bqk,bkc->bqc", probs, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        y = nn.Dense(c, dtype=self.dtype, name="proj_attn")(y)
        return y.reshape(b, h, w, c) + residual


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    groups: int = 32
    add_downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            x = VAEResnetBlock(self.out_channels, groups=self.groups,
                               dtype=self.dtype, name=f"resnets_{i}")(x)
        if self.add_downsample:
            # asymmetric (0,1) pad + stride-2 valid conv (diffusers
            # Downsample2D with padding=0 pads input (0,1,0,1))
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = SConv(self.out_channels, (3, 3), strides=(2, 2),
                        padding="VALID", dtype=self.dtype,
                        name="downsamplers_0")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    groups: int = 32
    add_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            x = VAEResnetBlock(self.out_channels, groups=self.groups,
                               dtype=self.dtype, name=f"resnets_{i}")(x)
        if self.add_upsample:
            # phase-decomposed nearest-2x + 3x3 conv (layers._UpsampleConv:
            # 2.25x fewer MACs than conv on the upsampled grid, identical
            # params and math — equivalence pinned in tests/test_layers.py)
            from storygen_tpu.models.layers import _UpsampleConv
            x = _UpsampleConv(self.out_channels, dtype=self.dtype,
                              name="upsamplers_0")(x)
        return x


class MidBlock(nn.Module):
    channels: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = VAEResnetBlock(self.channels, groups=self.groups,
                           dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttentionBlock(self.channels, groups=self.groups,
                              dtype=self.dtype, name="attentions_0")(x)
        x = VAEResnetBlock(self.channels, groups=self.groups,
                           dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        x = SConv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            is_final = i == len(cfg.block_out_channels) - 1
            x = DownEncoderBlock2D(ch, num_layers=cfg.layers_per_block,
                                   groups=cfg.norm_num_groups,
                                   add_downsample=not is_final,
                                   dtype=self.dtype,
                                   name=f"down_blocks_{i}")(x)
        x = MidBlock(cfg.block_out_channels[-1], groups=cfg.norm_num_groups,
                     dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=self.dtype,
                      act="silu", name="conv_norm_out")(x)
        x = SConv(2 * cfg.latent_channels, (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        rev = list(reversed(cfg.block_out_channels))
        x = SConv(rev[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(z)
        x = MidBlock(rev[0], groups=cfg.norm_num_groups, dtype=self.dtype,
                     name="mid_block")(x)
        for i, ch in enumerate(rev):
            is_final = i == len(rev) - 1
            x = UpDecoderBlock2D(ch, num_layers=cfg.layers_per_block + 1,
                                 groups=cfg.norm_num_groups,
                                 add_upsample=not is_final, dtype=self.dtype,
                                 name=f"up_blocks_{i}")(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=self.dtype,
                      act="silu", name="conv_norm_out")(x)
        x = SConv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        return x


class DiagonalGaussian(NamedTuple):
    """Latent distribution returned by encode (vae.encode(...).latent_dist,
    pipeline.py:392)."""
    mean: jax.Array
    logvar: jax.Array

    def sample(self, rng: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(rng, self.mean.shape,
                                                   self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        return 0.5 * jnp.sum(self.mean ** 2 + jnp.exp(self.logvar)
                             - 1.0 - self.logvar,
                             axis=tuple(range(1, self.mean.ndim)))


class AutoencoderKL(nn.Module):
    """encode: image (B,H,W,3) in [-1,1] -> DiagonalGaussian over
    (B,H/8,W/8,4); decode: latents -> image. Use `scaling_factor`
    (0.18215) at call sites exactly as the reference does
    (pipeline.py:393 multiply after encode, :200 divide before decode)."""
    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = SConv(2 * self.config.latent_channels, (1, 1),
                                  padding="VALID", dtype=self.dtype)
        self.post_quant_conv = SConv(self.config.latent_channels, (1, 1),
                                       padding="VALID", dtype=self.dtype)

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, jnp.clip(logvar, -30.0, 20.0))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x: jax.Array, rng: jax.Array) -> Tuple[jax.Array,
                                                              DiagonalGaussian]:
        dist = self.encode(x)
        z = dist.sample(rng)
        return self.decode(z), dist
