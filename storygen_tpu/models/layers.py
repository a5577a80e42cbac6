"""Core UNet building blocks, TPU-first (NHWC, bf16-friendly, fp32 norms).

Capability parity with the layers the reference imports from diffusers 0.13
(diffusers.models.resnet / embeddings, cited per class). These are new
implementations in flax.linen; spatial tensors are NHWC (XLA's preferred
TPU conv layout), not the reference's NCHW.

Module/parameter naming mirrors the diffusers checkpoint key structure so
that checkpoint/hf_import.py is a mechanical rename+transpose.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn

from storygen_tpu.ops.shift_conv import SConv
import jax
import jax.numpy as jnp

Dtype = Any


def get_timestep_embedding(timesteps: jax.Array, embedding_dim: int,
                           flip_sin_to_cos: bool = True,
                           downscale_freq_shift: float = 0.0,
                           max_period: int = 10000,
                           scale: float = 1.0) -> jax.Array:
    """Sinusoidal timestep embedding.

    Matches diffusers.models.embeddings.Timesteps as configured by the
    reference UNet (model/unet_2d_condition.py:138: flip_sin_to_cos=True,
    freq_shift=0). Always computed in fp32.
    """
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """MLP over the sinusoidal embedding (diffusers TimestepEmbedding;
    model/unet_2d_condition.py:145)."""
    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          name="linear_2")(sample)
        return sample


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics regardless of compute dtype.

    TPU layout note: stats are computed as per-CHANNEL spatial moments
    (lane-preserving sublane reductions over the NHWC layout) folded into
    per-group moments on a tiny (B, C) tensor — the naive
    (B, *, groups, C/groups) reshape forces an XLA relayout copy on TPU
    (C/groups = 10 lanes at C=320), measured at ~2x the bandwidth floor
    per norm site (scripts/profile_sampler.py). The group stats then fold
    with the affine into one per-channel (a, b), applied in a single
    elementwise pass; `act="silu"` fuses the activation into that pass
    (diffusers ResnetBlock2D always follows GN with SiLU).

    Precision note: the default variance is one-pass (E[x^2] - mean^2 in
    fp32), which loses precision to cancellation when |mean| >> std; the
    reference/diffusers two-pass moments do not. For SD-scale activations
    the observed drift is <= ~1e-3 relative per site (the widened
    DP-vs-single-device test tolerance) with no measurable effect on
    sampler output. `two_pass=True` subtracts the group mean before the
    squared reduce (reference-parity moments) for fp32 parity checks, at
    one extra pass over the activation.
    """
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    act: Optional[str] = None
    two_pass: bool = False
    # fold_affine=True returns the folded per-batch per-channel (a, b)
    # fp32 pair INSTEAD of applying it — the consumer (SConv prologue)
    # applies silu(x*a + b), fused into the conv kernel's VMEM slab load
    # at halo-eligible sites so the normalized tensor never reaches HBM.
    # Only the stats passes run here; `act` is the consumer's job.
    fold_affine: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        orig_dtype = x.dtype
        c = x.shape[-1]
        b = x.shape[0]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        red_axes = tuple(range(1, x.ndim - 1))
        n_per_group = (math.prod(x.shape[1:-1])) * (c // g)
        # Stats read the bf16 input directly (fp32 accumulation inside the
        # reduce ops). Keeping the fp32 upcast inside each consumer stops
        # XLA from materializing a full fp32 copy of x in HBM (a separate
        # convert_element_type pass measured at ~2x this op's bandwidth
        # floor in the sampler profile).
        s1 = jnp.sum(x, axis=red_axes, dtype=jnp.float32)          # (B, C)
        gmean = s1.reshape(b, g, c // g).sum(-1) / n_per_group     # (B, g)
        if self.two_pass:
            mean_bc = jnp.repeat(gmean, c // g, axis=1)            # (B, C)
            cshape = (b,) + (1,) * (x.ndim - 2) + (c,)
            xc = x.astype(jnp.float32) - mean_bc.reshape(cshape)
            s2c = jnp.sum(xc * xc, axis=red_axes)                  # (B, C)
            gvar = s2c.reshape(b, g, c // g).sum(-1) / n_per_group
        else:
            flat = x.reshape(b, -1, c)
            s2 = jax.lax.dot_general(                              # (B, C)
                flat, flat, (((1,), (1,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.float32)
            gex2 = s2.reshape(b, g, c // g).sum(-1) / n_per_group
            gvar = jnp.maximum(gex2 - gmean * gmean, 0.0)
        ginv = jax.lax.rsqrt(gvar + self.epsilon)                  # (B, g)
        mean_c = jnp.repeat(gmean, c // g, axis=1)                 # (B, C)
        inv_c = jnp.repeat(ginv, c // g, axis=1)
        a = inv_c * scale[None]                                    # (B, C)
        bshift = bias[None] - mean_c * a
        if self.fold_affine:
            return a, bshift
        bc_shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        y = (x.astype(jnp.float32) * a.reshape(bc_shape)
             + bshift.reshape(bc_shape))
        if self.act == "silu":
            y = y * jax.nn.sigmoid(y)
        return y.astype(orig_dtype)


class Conv2D(nn.Module):
    """3x3/1x1 conv over NHWC; thin wrapper pinning dtype policy."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return SConv(self.features,
                       kernel_size=(self.kernel_size, self.kernel_size),
                       strides=(self.strides, self.strides),
                       padding=((self.padding, self.padding),
                                (self.padding, self.padding)),
                       dtype=self.dtype, name="conv")(x)


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> conv -> +temb -> GN -> SiLU -> conv (+ 1x1 shortcut).

    Parity: diffusers.models.resnet.ResnetBlock2D with
    time_embedding_norm="default", output_scale_factor=1, pre_norm=True
    (imported at model/unet_2d_blocks.py:5, instantiated e.g. :331-343).
    """
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array]) -> jax.Array:
        # GroupNorms run in folded form: they emit per-(batch, channel)
        # (a, b) and the SiLU-affine is applied by SConv — fused into the
        # halo conv kernel's VMEM slab at eligible sites, the identical
        # XLA elementwise pass elsewhere. The temb add rides the conv1
        # output write as a per-batch bias the same way. Parameter tree
        # (norm1/2.scale|bias, conv1/2.kernel|bias) is unchanged.
        in_channels = x.shape[-1]
        a1, s1 = GroupNorm(self.groups, self.eps, dtype=self.dtype,
                           fold_affine=True, name="norm1")(x)
        temb_proj = None
        if temb is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype,
                                 name="time_emb_proj")(nn.silu(temb))
        h = SConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                  dtype=self.dtype, name="conv1")(
                      x, prologue=(a1, s1), extra_bias=temb_proj)
        a2, s2 = GroupNorm(self.groups, self.eps, dtype=self.dtype,
                           fold_affine=True, name="norm2")(h)
        if in_channels != self.out_channels:
            x = SConv(self.out_channels, (1, 1), padding="VALID",
                        dtype=self.dtype, name="conv_shortcut")(x)
        # skip connection rides conv2's output write (halo sites: the
        # bare conv2 result never exists in HBM)
        return SConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                     dtype=self.dtype, name="conv2")(
                         h, prologue=(a2, s2), residual=x)


class Downsample2D(nn.Module):
    """Strided 3x3 conv, pad 1 (diffusers Downsample2D with use_conv=True,
    name="op"; model/unet_2d_blocks.py:361-368)."""
    out_channels: int
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.padding
        return SConv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=((p, p), (p, p)), dtype=self.dtype,
                       name="conv")(x)


class _UpsampleConv(nn.Module):
    """Phase-decomposed (nearest-2x-upsample + 3x3 conv).

    Because nearest upsampling duplicates each source pixel 2x2, the 3x3
    conv on the upsampled grid touches at most 2x2 DISTINCT source pixels
    per output — so the op is exactly four 2x2 convs on the original grid
    (one per output phase), with kernels formed by summing the 3x3 taps
    that land on the same source pixel:
      rows, phase 0 (taps i-1, i):   [w0, w1+w2]
      rows, phase 1 (taps i, i+1):   [w0+w1, w2]
    (same rule on columns). 16 instead of 36 MACs per output position
    (2.25x fewer FLOPs) and the (B, 2H, 2W, C) nearest-upsampled
    intermediate never exists in HBM. Parameters are identical to
    SConv(out, (3,3)) — checkpoint layout unchanged."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.out_channels), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)

        def pair(k, axis, phase):
            k0, k1, k2 = (jax.lax.index_in_dim(k, i, axis) for i in range(3))
            taps = ([k0, k1 + k2] if phase == 0 else [k0 + k1, k2])
            return jnp.concatenate(taps, axis=axis)

        from storygen_tpu.ops import shift_conv as SC
        from storygen_tpu.ops.attention import _on_tpu
        use_shift = SC.ENABLED and _on_tpu()
        dn = ("NHWC", "HWIO", "NHWC")
        phases = []
        for a in (0, 1):
            for bb in (0, 1):
                kab = pair(pair(kernel, 0, a), 1, bb).astype(self.dtype)
                pr = (1, 0) if a == 0 else (0, 1)
                pc = (1, 0) if bb == 0 else (0, 1)
                if use_shift:
                    # 2x2 phase kernels ride the shift-GEMM path too
                    # (ops/shift_conv.py rationale)
                    phases.append(SC.shift_conv(x, kab, None, 1, (pr, pc)))
                else:
                    phases.append(jax.lax.conv_general_dilated(
                        x, kab, (1, 1), (pr, pc), dimension_numbers=dn))
        y = jnp.stack(phases).reshape(2, 2, b, h, w, self.out_channels)
        y = y.transpose(2, 3, 0, 4, 1, 5).reshape(
            b, 2 * h, 2 * w, self.out_channels)
        return y + bias.astype(self.dtype)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv (diffusers Upsample2D use_conv=True;
    model/unet_2d_blocks.py:582). The 2x case runs as four phase convs on
    the source grid (_UpsampleConv); non-2x output sizes fall back to
    repeat + conv."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 output_size: Optional[Tuple[int, int]] = None) -> jax.Array:
        b, h, w, c = x.shape
        if output_size is None or output_size == (h * 2, w * 2):
            return _UpsampleConv(self.out_channels, dtype=self.dtype,
                                 name="conv")(x)
        # nearest-neighbor upsample as repeat: exact match to F.interpolate
        # (mode="nearest") for integer scale factors.
        x = jnp.repeat(jnp.repeat(x, output_size[0] // h, axis=1),
                       output_size[1] // w, axis=2)
        return SConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)
