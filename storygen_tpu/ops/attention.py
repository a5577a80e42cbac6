"""Multi-head attention ops for TPU.

Two execution paths behind one API:

- `xla`: einsum-based attention. XLA maps the batched matmuls onto the MXU
  and fuses the softmax chain; softmax statistics are computed in fp32.
- `flash`: Pallas fused attention (ops/pallas_attention.py) that never
  materializes the (Sq, Skv) logits in HBM — the win at Sq=4096 where the
  naive path writes 4096^2 logits per (batch, head).

Capability parity target: diffusers 0.13 CrossAttention + xformers
memory-efficient attention as used by the reference
(model/attention.py:175-223, train_StorySalon_stage2.py:159-161).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# "auto" routes big unmasked attention through the Pallas flash kernel and
# everything else through XLA einsum; "xla"/"flash" force one path.
_DEFAULT_BACKEND = "auto"


def set_default_backend(backend: str) -> None:
    global _DEFAULT_BACKEND
    assert backend in ("xla", "flash", "auto")
    _DEFAULT_BACKEND = backend


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, S, H*D) -> (B, H, S, D)."""
    b, s, hd = x.shape
    return x.reshape(b, s, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, S, D) -> (B, S, H*D)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  scale: float,
                  mask: Optional[jax.Array] = None) -> jax.Array:
    """Attention over (B, H, S, D) tensors with fp32 softmax accumulation."""
    dtype = q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         num_heads: int,
                         mask: Optional[jax.Array] = None,
                         ref_mask: Optional[jax.Array] = None,
                         backend: Optional[str] = None,
                         variant: Optional[str] = None,
                         out_layout: str = "seq"):
    """Full MHA over pre-projection tensors.

    Args:
      q: (B, Sq, H*D)
      k, v: (B, Skv, H*D)
      mask: optional broadcastable boolean (B, 1|H, Sq, Skv), True = keep.
      ref_mask: optional (B, N) per-reference-frame keep flags for a kv
        made of N equal spans (attn3's kv-concat layout) — stays on the
        flash path as a block mask when spans tile into kv blocks.
      variant: flash forward-kernel variant threaded through to
        pallas_attention.flash_attention ("bnd_guard" | "bnd" |
        "online_t" | "grid"); None uses that module's default.
      out_layout: "seq" returns the (B, Sq, H*D) array alone; "auto"
        always returns an (array, layout) TUPLE — layout is "feat"
        ((B, H*D, Sq), the flash kernels' native transposed layout, free
        of relayout copies; the caller contracts the H*D axis directly in
        its output projection) on the flash path and "seq" on XLA. The
        return type is monomorphic for each out_layout value.
    """
    assert out_layout in ("seq", "auto"), out_layout
    backend = backend or _DEFAULT_BACKEND
    head_dim = q.shape[-1] // num_heads
    scale = head_dim ** -0.5
    qh, kh, vh = (split_heads(t, num_heads) for t in (q, k, v))
    sq, skv = qh.shape[2], kh.shape[2]

    if ref_mask is not None and mask is None:
        n = ref_mask.shape[1]
        if backend in ("flash", "auto") and _on_tpu():
            from storygen_tpu.ops.pallas_attention import (
                flash_attention, flash_supported, ref_mask_block_k)
            bk = ref_mask_block_k(skv, n)
            if bk is not None and flash_supported(sq, skv, has_mask=False):
                span_blocks = (skv // n) // bk
                block_mask = jnp.repeat(ref_mask.astype(jnp.float32),
                                        span_blocks, axis=1)
                if out_layout == "auto":
                    out = flash_attention(qh, kh, vh, scale=scale,
                                          block_k=bk, block_mask=block_mask,
                                          variant=variant,
                                          out_layout="bhds")
                    b, h, d, s_ = out.shape
                    return out.reshape(b, h * d, s_), "feat"
                out = flash_attention(qh, kh, vh, scale=scale, block_k=bk,
                                      block_mask=block_mask, variant=variant)
                return merge_heads(out)
        # fallback: expand to an elementwise kv mask for the XLA path
        mask = jnp.repeat(ref_mask.astype(bool), skv // n,
                          axis=1)[:, None, None, :]

    use_flash = False
    if backend in ("flash", "auto") and _on_tpu():
        from storygen_tpu.ops.pallas_attention import flash_supported
        if backend == "flash":
            use_flash = mask is None
        else:
            use_flash = flash_supported(sq, skv, has_mask=mask is not None)
    if use_flash:
        from storygen_tpu.ops.pallas_attention import flash_attention
        if out_layout == "auto":
            out = flash_attention(qh, kh, vh, scale=scale, variant=variant,
                                  out_layout="bhds")
            b, h, d, s_ = out.shape
            return out.reshape(b, h * d, s_), "feat"
        out = flash_attention(qh, kh, vh, scale=scale, variant=variant)
    else:
        out = xla_attention(qh, kh, vh, scale, mask=mask)
    merged = merge_heads(out)
    return (merged, "seq") if out_layout == "auto" else merged


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
