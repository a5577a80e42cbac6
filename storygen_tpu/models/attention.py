"""VLCM transformer block: self-attn, text-cross-attn, image-cross-attn, FF.

This is the StoryGen core novelty re-built for TPU. Capability parity with
model/attention.py in the reference:

- `BasicTransformerBlock` = attn1 (self) + attn2 (text cross, kv dim 768)
  + attn3 (image cross, kv dim = query dim) + GEGLU feed-forward
  (model/attention.py:131-302).
- The *feature tap*: the hidden state right after the self-attention
  residual is returned as `img_dif_condition` (model/attention.py:262-263).
- Text and image branches run in parallel from the same post-self-attn
  state and are summed: h = h_t + h_i (model/attention.py:277,291-293).

TPU-first differences from the reference:
- One pure function with an optional `image_context` input instead of two
  stateful code paths; jit specializes the two cycles into separate
  executables.
- Attention runs through ops/attention.py (XLA einsum or Pallas flash).
- NHWC spatial layout; projection in/out via 1x1 conv == Dense on the
  channel axis (mathematically identical, one fused matmul on the MXU).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from storygen_tpu.models.layers import GroupNorm
from storygen_tpu.ops.attention import multi_head_attention

Dtype = Any


class _OutProj(nn.Module):
    """Output projection that accepts either attention output layout.

    Parameters are identical to nn.Dense(features) — kernel (K, features)
    + bias — so checkpoint import/export is unchanged. For the flash
    kernels' native "feat" layout (B, K, S) it contracts K as a K-major
    GEMM (MXU-native lhs-transposed dot), avoiding the (B, H, D, S) ->
    (B, S, H*D) relayout copy the "seq" path would pay."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, layout: str) -> jax.Array:
        k_dim = x.shape[-1] if layout == "seq" else x.shape[1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        if layout == "seq":
            y = x @ kernel
        else:  # (B, K, S) -> (B, S, features)
            y = jax.lax.dot_general(x, kernel, (((1,), (0,)), ((), ())))
        return y + bias.astype(self.dtype)


class _ProjKernel(nn.Module):
    """Bias-free projection WEIGHT holder: params identical to
    nn.Dense(features, use_bias=False) — a (in, features) lecun-normal
    "kernel" — but only the weight is materialized, so sibling
    projections reading the same input can CONCATENATE their kernels into
    one fused GEMM (q|k|v for self-attention, k|v for cross-attention)
    instead of re-reading the activations three times through three
    smaller-N matmuls."""
    in_dim: int
    features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_dim, self.features), jnp.float32)


class CrossAttention(nn.Module):
    """QKV-projected multi-head attention (diffusers CrossAttention parity;
    used at model/attention.py:175,192,215). No bias on q/k/v, bias on out.

    Cross-attention k/v projections over the shared context run as ONE
    fused GEMM (concatenated kernels — mathematically the independent
    products; param layout unchanged). Self-attention keeps three
    separate GEMMs: the fused (M, 3N) form measured SLOWER on v5e
    (+2.3 ms/step, xprof round 3 — the post-GEMM split costs more than
    the saved activation reads)."""
    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None  # None -> self-attention
    dtype: Dtype = jnp.float32
    backend: Optional[str] = None
    variant: Optional[str] = None  # flash forward-kernel variant

    @nn.compact
    def __call__(self, hidden_states: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 ref_mask: Optional[jax.Array] = None) -> jax.Array:
        inner_dim = self.heads * self.dim_head
        q_in = hidden_states.shape[-1]
        is_self = encoder_hidden_states is None
        context = hidden_states if is_self else encoder_hidden_states
        kv_in = context.shape[-1]
        wq = _ProjKernel(q_in, inner_dim, name="to_q")()
        wk = _ProjKernel(kv_in, inner_dim, name="to_k")()
        wv = _ProjKernel(kv_in, inner_dim, name="to_v")()
        q = hidden_states @ wq.astype(self.dtype)
        if is_self:
            k = context @ wk.astype(self.dtype)
            v = context @ wv.astype(self.dtype)
        else:
            kv = context @ jnp.concatenate(
                [wk, wv], axis=1).astype(self.dtype)
            k, v = jnp.split(kv, 2, axis=-1)
        out, layout = multi_head_attention(
            q, k, v, self.heads, mask=mask, ref_mask=ref_mask,
            backend=self.backend, variant=self.variant, out_layout="auto")
        return _OutProj(self.query_dim, dtype=self.dtype,
                        name="to_out_0")(out, layout)


class GEGLU(nn.Module):
    """x W1 * gelu(x W2), packed as one (dim -> 2*inner) projection
    (model/attention.py:373-393; chunk order: value first, gate second).

    With return_proj=True only the packed projection is returned — the
    gate runs inside the fused Pallas GEGLU+GEMM kernel instead (see
    FeedForward)."""
    dim_out: int
    dtype: Dtype = jnp.float32
    return_proj: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        proj = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        if self.return_proj:
            return proj
        value, gate = jnp.split(proj, 2, axis=-1)
        return value * nn.gelu(gate, approximate=False)


class GELUProj(nn.Module):
    """Plain-GELU feed-forward projection: x W -> gelu (exact, not tanh)
    (model/attention.py:353-370, the `GELU` class — dormant at the SD-1.5
    operating point, which configures GEGLU; present for API parity)."""
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        proj = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
        return nn.gelu(proj, approximate=False)


class AdaLayerNorm(nn.Module):
    """Timestep-adaptive LayerNorm (model/attention.py:396-412):
    emb(t) -> SiLU -> Dense(2*dim) -> (scale, shift);
    out = LN_noaffine(x) * (1 + scale) + shift.

    Dormant at the SD-1.5 operating point (num_embeds_ada_norm unset in
    the UNet config); present for API parity with the reference block."""
    embedding_dim: int
    num_embeddings: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array) -> jax.Array:
        emb = nn.Embed(self.num_embeddings, self.embedding_dim,
                       name="emb")(timestep)
        emb = nn.Dense(self.embedding_dim * 2, dtype=self.dtype,
                       name="linear")(nn.silu(emb))
        scale, shift = jnp.split(emb, 2, axis=-1)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        # scale/shift are per-(batch-of-timestep): unsqueeze to broadcast
        # over the token axis like the reference's [:, None] indexing
        while scale.ndim < x.ndim:
            scale = scale[:, None]
            shift = shift[:, None]
        return (xf * (1 + scale.astype(jnp.float32))
                + shift.astype(jnp.float32)).astype(x.dtype)


class _Net2(nn.Module):
    """ff output projection; parameters identical to nn.Dense(features).

    mode "fused": input is the packed (…, 2*inner) GEGLU projection and
    the gate + GEMM run in one Pallas kernel (ops/pallas_geglu.py) — the
    gated product never exists in HBM. mode "plain": standard Dense over
    the pre-gated activations."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mode: str) -> jax.Array:
        k_dim = x.shape[-1] // 2 if mode == "fused" else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if mode == "fused":
            from storygen_tpu.ops.pallas_geglu import geglu_matmul
            lead = x.shape[:-1]
            flat = x.reshape(-1, x.shape[-1])
            out = geglu_matmul(flat, kernel, bias)
            return out.reshape(*lead, self.features)
        return x @ kernel + bias


class FeedForward(nn.Module):
    """GEGLU -> Dense, mult=4 (model/attention.py:305-350).

    activation_fn="gelu" selects the reference's plain-GELU variant
    (model/attention.py:320-324) — dormant at the SD-1.5 operating point,
    wired for API parity; param names (net_0.proj, net_2) match either
    way so diffusers checkpoints of both flavors import."""
    dim: int
    mult: int = 4
    activation_fn: str = "geglu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from storygen_tpu.ops import pallas_geglu
        from storygen_tpu.ops.attention import _on_tpu
        inner = self.dim * self.mult
        if self.activation_fn == "gelu":
            x = GELUProj(inner, dtype=self.dtype, name="net_0")(x)
            return _Net2(self.dim, dtype=self.dtype, name="net_2")(
                x, "plain")
        m = 1
        for s in x.shape[:-1]:
            m *= s
        fused = (pallas_geglu.ENABLED and _on_tpu()
                 and pallas_geglu.supported(m, 2 * inner)
                 and not self.is_initializing())
        x = GEGLU(inner, dtype=self.dtype, return_proj=fused,
                  name="net_0")(x)
        return _Net2(self.dim, dtype=self.dtype, name="net_2")(
            x, "fused" if fused else "plain")


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics (torch nn.LayerNorm parity, eps 1e-5)."""
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (xf * scale + bias).astype(orig_dtype)


class BasicTransformerBlock(nn.Module):
    """attn1 -> [tap] -> (attn2 || attn3) -> sum -> FF.

    Returns (hidden_states, img_dif_condition) where the condition is the
    post-attn1 hidden state (model/attention.py:236-302).

    `image_ref_mask` (B, N_refs) masks attn3's reference-frame kv spans —
    the TPU-native mechanism for training with a random 1-3 reference
    frames at static shapes (replaces the reference's dynamic per-step ref
    loop, train_StorySalon_stage2.py:306-318). Per-ref granularity keeps
    the masked attention on the Pallas flash path (block mask).
    """
    dim: int
    num_heads: int
    head_dim: int
    cross_attention_dim: int = 768
    dtype: Dtype = jnp.float32
    attn_backend: Optional[str] = None
    attn_variant: Optional[str] = None

    @nn.compact
    def __call__(self, hidden_states: jax.Array,
                 encoder_hidden_states: jax.Array,
                 image_hidden_states: Optional[jax.Array] = None,
                 image_ref_mask: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, jax.Array]:
        # 1. self-attention
        norm_h = LayerNorm(dtype=self.dtype, name="norm1")(hidden_states)
        attn_out = CrossAttention(self.dim, self.num_heads, self.head_dim,
                                  dtype=self.dtype, backend=self.attn_backend,
                                  variant=self.attn_variant,
                                  name="attn1")(norm_h)
        hidden_states = attn_out + hidden_states
        img_dif_condition = hidden_states  # feature tap (attention.py:263)

        # 2. text cross-attention (branch from the shared state)
        norm_t = LayerNorm(dtype=self.dtype, name="norm2")(hidden_states)
        attn_t = CrossAttention(self.dim, self.num_heads, self.head_dim,
                                cross_attention_dim=self.cross_attention_dim,
                                dtype=self.dtype, backend=self.attn_backend,
                                variant=self.attn_variant,
                                name="attn2")(
            norm_t, encoder_hidden_states=encoder_hidden_states)
        hidden_states_t = attn_t + hidden_states

        # 3. image cross-attention (parallel branch; attention.py:281-293).
        # attn3/norm4 parameters must exist in both cycles so the reference
        # and image passes share one parameter pytree; when there is no image
        # context the branch is skipped at trace time (dead-code-free jit).
        norm_i = LayerNorm(dtype=self.dtype, name="norm4")(hidden_states)
        attn3 = CrossAttention(self.dim, self.num_heads, self.head_dim,
                               cross_attention_dim=self.dim,
                               dtype=self.dtype, backend=self.attn_backend,
                               variant=self.attn_variant,
                               name="attn3")
        if image_hidden_states is not None:
            attn_i = attn3(norm_i, encoder_hidden_states=image_hidden_states,
                           ref_mask=image_ref_mask)
            hidden_states = hidden_states_t + (attn_i + hidden_states)
        else:
            # Keep attn3 params initialized even on the reference cycle.
            if self.is_initializing():
                attn3(norm_i[:, :1], encoder_hidden_states=norm_i[:, :1])
            hidden_states = hidden_states_t

        # 4. feed-forward
        norm_ff = LayerNorm(dtype=self.dtype, name="norm3")(hidden_states)
        hidden_states = FeedForward(self.dim, dtype=self.dtype,
                                    name="ff")(norm_ff) + hidden_states
        return hidden_states, img_dif_condition


class Transformer2DModel(nn.Module):
    """GN -> 1x1 proj_in -> BasicTransformerBlock -> 1x1 proj_out + residual.

    Parity: model/attention.py:26-128 (use_linear_projection=False variant;
    the 1x1 convs are expressed as Dense over NHWC channels — identical math,
    better XLA fusion).
    """
    num_heads: int
    head_dim: int
    in_channels: int
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    attn_backend: Optional[str] = None
    attn_variant: Optional[str] = None

    @nn.compact
    def __call__(self, hidden_states: jax.Array,
                 encoder_hidden_states: jax.Array,
                 image_hidden_states: Optional[jax.Array] = None,
                 image_ref_mask: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, jax.Array]:
        b, h, w, c = hidden_states.shape
        inner_dim = self.num_heads * self.head_dim
        residual = hidden_states
        x = GroupNorm(self.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                      name="norm")(hidden_states)
        x = nn.Dense(inner_dim, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner_dim)
        x, img_dif_condition = BasicTransformerBlock(
            inner_dim, self.num_heads, self.head_dim,
            cross_attention_dim=self.cross_attention_dim, dtype=self.dtype,
            attn_backend=self.attn_backend, attn_variant=self.attn_variant,
            name="transformer_blocks_0")(
            x, encoder_hidden_states, image_hidden_states, image_ref_mask)
        x = x.reshape(b, h, w, inner_dim)
        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(x)
        return x + residual, img_dif_condition
