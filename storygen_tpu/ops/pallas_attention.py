"""Pallas TPU flash attention for the StoryGen UNet.

Replaces the xformers memory-efficient attention the reference enables
(train_StorySalon_stage2.py:159-161) with a TPU-native fused kernel.

Why: at 512px the UNet's first-level attention runs at Sq=4096 and attn3's
kv grows to 3*4096=12288 (3 reference frames, kv-concat per
pipeline.py:440-443). Naive XLA attention materializes the (Sq, Skv)
logits in HBM — at batch 9 x 8 heads that is GBs of traffic per forward,
which is exactly the HBM-bandwidth wall. This kernel streams kv blocks
through VMEM with the online-softmax recurrence, never materializing
logits.

Kernel shape notes (v5e):
- grid (B*H, Sq/BQ, Skv/BK), kv innermost so the fp32 accumulator scratch
  carries across kv steps; outputs written on the last kv step.
- fp32 running max/sum/accumulator; bf16 MXU matmuls.
- head_dim 40/80/160 (SD-1.5 widths / 8 heads) ride in a padded 128/256
  lane layout chosen by Mosaic; the contraction dim does not need padding.

Used automatically by ops/attention.multi_head_attention when shapes
qualify (no mask, block-divisible, big enough to be bandwidth-bound).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale: float, num_kv_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BQ, BK) fp32

    m_prev = m_ref[:, :1]                      # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                     # (BQ, BK) fp32
    alpha = jnp.exp(m_prev - m_new)            # (BQ, 1)

    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # (BQ, D)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _pick_block(size: int, preferred: int) -> Optional[int]:
    # v5e sweep (scripts/profile_unet.py): bq=512, bk=1024 is fastest on
    # the hot shapes (4096x4096 and 4096x12288); shrink only when the
    # sequence does not divide.
    for b in (preferred, 1024, 512, 256, 128):
        if b <= size and size % b == 0:
            return b
    return None


@functools.partial(jax.custom_vjp, nondiff_argnames=("scale", "block_q",
                                                     "block_k", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float = 1.0, block_q: int = 512,
                    block_k: int = 1024,
                    interpret: bool = False) -> jax.Array:
    """Fused attention over (B, H, S, D) tensors (no mask).

    Requires Sq % block_q == 0 and Skv % block_k == 0 after block
    auto-shrink; callers should gate with `flash_supported`.

    Differentiable: the custom VJP recomputes attention with the XLA
    einsum formulation for the backward pass (flash forward keeps serving
    fast; training backward materializes logits — a dedicated backward
    kernel is the next optimization).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq = _pick_block(sq, block_q)
    bk = _pick_block(skv, block_k)
    if bq is None or bk is None:
        raise ValueError(f"unsupported seq lens ({sq}, {skv})")

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    num_kv_blocks = skv // bk

    grid = (b * h, sq // bq, num_kv_blocks)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale,
                          num_kv_blocks=num_kv_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    out = flash_attention(q, k, v, scale=scale, block_q=block_q,
                          block_k=block_k, interpret=interpret)
    return out, (q, k, v)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    """Memory-bounded backward: the standard attention gradient
    (dV = P^T g; dP = g V^T; dS = P (dP - rowsum(dP P)); dQ = dS K s;
    dK = dS^T Q s) recomputed in q-chunks under lax.scan, so the peak
    live logits buffer is (B, H, CHUNK, Skv) instead of (B, H, Sq, Skv).
    fp32 softmax statistics; bf16 matmul inputs."""
    q, k, v = res
    b, h, sq, d = q.shape
    chunk = min(512, sq)
    n_chunks = sq // chunk
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    q_c = q.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)
    g_c = g.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)

    def body(carry, qg):
        dk_acc, dv_acc = carry
        qc, gc = qg
        qcf = qc.astype(jnp.float32)
        gcf = gc.astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qcf, kf,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", p, gcf)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gcf, vf)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_c = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
        dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", ds, qcf) * scale
        return (dk_acc, dv_acc), dq_c

    zeros = jnp.zeros(k.shape, jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(body, (zeros, zeros), (q_c, g_c))
    dq = dq_chunks.transpose(1, 2, 0, 3, 4).reshape(b, h, sq, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_supported(sq: int, skv: int, has_mask: bool,
                    min_flops: int = 1 << 20) -> bool:
    """Flash pays off when the logits matrix is big enough to be
    HBM-bound and blocks divide the sequence lengths.

    Threshold from v5e measurements (scripts/profile_unet.py, bq=512
    bk=1024): 4096x4096 1.75x, 4096x12288 2.5x, 1024x3072 1.25x,
    1024x1024 1.15x faster than XLA; smaller shapes favor XLA."""
    if has_mask:
        return False
    if sq * skv < min_flops:
        return False
    return (_pick_block(sq, 512) is not None
            and _pick_block(skv, 1024) is not None)
