"""CLIP ViT-L/14 text encoder in flax.

Capability parity with the transformers CLIPTextModel the reference loads
(model/pipeline.py:15, used at pipeline.py:137 and train_*:143: output[0] =
last_hidden_state (B, 77, 768) feeds UNet attn2).

Config: ckpt/stable-diffusion-v1-5/CLIP/config.json text_config
(12 layers, 12 heads, hidden 768, quick_gelu, causal mask, eps 1e-5).

Tokenization stays on host (storygen_tpu/data/tokenizer.py); this module is
the pure device-side function of token ids.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from storygen_tpu.configs import CLIPTextConfig
from storygen_tpu.ops.attention import multi_head_attention

Dtype = Any


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.config
        d = cfg.hidden_size
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        out = multi_head_attention(q, k, v, cfg.num_attention_heads,
                                   mask=mask, backend="xla")
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.config
        residual = x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = residual + CLIPAttention(cfg, dtype=self.dtype,
                                     name="self_attn")(y, mask)
        residual = x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = quick_gelu(y)
        y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(y)
        return residual + y


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 position_ids: Optional[jax.Array] = None) -> jax.Array:
        """input_ids: (B, S) int32 -> last_hidden_state (B, S, hidden)."""
        cfg = self.config
        b, s = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(s)[None, :]
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       dtype=self.dtype, name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embedding")(
            position_ids)
        x = tok + pos
        # causal mask: query attends to keys <= its position
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype,
                                 name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        return x


def init_clip_params(rng: jax.Array,
                     config: CLIPTextConfig = CLIPTextConfig(),
                     dtype=jnp.float32):
    model = CLIPTextModel(config=config, dtype=dtype)
    ids = jnp.zeros((1, config.max_position_embeddings), jnp.int32)
    params = jax.jit(model.init)(rng, ids)
    return model, params
