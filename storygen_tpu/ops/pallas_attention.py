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
- bq=512, bk=1024 from an on-device sweep (scripts/profile_unet.py).

Reference-frame masking: training uses a random subset of the 3 reference
frames (train_StorySalon_stage2.py:306-318). Each ref owns a contiguous
kv span, so the mask is constant per kv block — passed as a per-(batch,
kv-block) scalar table, applied as an additive -inf before the online
softmax. This keeps the masked attn3 on the flash path (no logits in HBM)
in both training and serving.

Differentiable: custom VJP with a q-chunked lax.scan recompute backward —
peak live logits (B, H, 512, Skv) instead of (B, H, Sq, Skv).

Forward variants (round-2 MFU work; on-chip ablation in
scripts/studies/bench_attn_ablate.py):

- "grid" — the original kernel: (BQ, BK) logits, online softmax with
  running (max, sum) scratch carried across kv grid steps.
- "bnd" (default) — TRANSPOSED, stats-free kernel. Two structural wins:
  (1) the PV matmul runs as dot_general(v, p_t) -> (D, BQ), so head_dim
  rides the MXU's streaming axis instead of a 128-padded output tile —
  at d=40 this removes the 3.2x lane-padding waste of the PV dot
  entirely (measured: PV adds ~0.6 ms on top of the 3.4 ms qk floor at
  4096x12288, vs ~equal-to-qk before); (2) softmax runs max-free — logits
  are pre-shifted by a per-row upper bound b_i = q_i k_mean + |q_i| *
  max_j |k_j - k_mean| (>= row max by Cauchy-Schwarz around the key
  centroid), folded into an extra q/k column, and the row sum rides the
  MXU as a ones-column of v. No running stats, no rescale chain between
  kv steps, base-2 exp. Exact softmax after the final division; validity
  domain: (bound - logit) within fp32 exp2 range (~126), i.e. natural-
  units logits |s| <~ 85 — SD attention logits are O(10). Measured on
  v5e: attn3 L1 5.8 -> 4.0 ms, attn1 L1(b6) 4.4 -> 3.0 ms.
- "online_t" — transposed layout with the exact online-softmax
  recurrence (stats as (1, BQ) lane rows). ~10-15% slower than "bnd";
  no bound-domain caveat. Used where inputs may be adversarially scaled.

Used automatically by ops/attention.multi_head_attention when shapes
qualify.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634

# Forward kernel variant: "bnd_guard" (default: the stats-free "bnd"
# kernel with its per-row logit bound's deviation term clamped at 120
# exp2-units — exact through ~2x the raw kernel's domain, and NaN-loud
# instead of silently zeroing beyond it; no lax.cond, no dispatch
# overhead — see _transposed_fwd), "bnd" (raw bounded kernel, no
# clamp), "online_t" (transposed exact online softmax), "grid"
# (original).
# Module-level default; callers can thread an explicit variant through
# flash_attention(variant=...) / the models' attn_variant attribute.
FORWARD_VARIANT = "bnd_guard"


def _bnd_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, d: int,
                num_kv_blocks: int, mask_ref=None):
    """Transposed stats-free flash step. Blocks: q (BQ, D+1) pre-scaled by
    softmax_scale*log2(e) with -row_bound in the last column; k (BK, D+1)
    with a ones column; v (BK, D+1) with a ones column (row-sum channel).
    acc (D+1, BQ) fp32."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_t = jax.lax.dot_general(
        k_ref[0], q_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (BK, BQ), <= 0
    if mask_ref is not None:
        # whole-block keep/drop BEFORE exp2: with kept-only bound stats
        # a dropped block's logits may exceed the bound, and exp2->inf
        # then *0 would be NaN; additive -1e30 makes exp2 exactly 0.
        s_t = s_t + (mask_ref[pl.program_id(0), ki] - 1.0) * (-NEG_INF)
    p_t = jnp.exp2(s_t)
    acc_ref[:] += jax.lax.dot_general(
        v_ref[0], p_t.astype(v_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (D+1, BQ)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        # floor below exp2(-120) (the smallest in-domain row sum) so the
        # clamp never engages inside the guard domain; must stay a
        # NORMAL fp32 (subnormals flush to zero -> 0/0 NaN)
        o_ref[0] = (acc_ref[:d, :]
                    / jnp.maximum(acc_ref[d:d + 1, :], 1.2e-38)
                    ).astype(o_ref.dtype)


def _bnd_masked_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, *,
                       d: int, num_kv_blocks: int):
    _bnd_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, d=d,
                num_kv_blocks=num_kv_blocks, mask_ref=mask_ref)


def _bnd2_kernel(bound_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *,
                 num_kv_blocks: int, mask_ref=None):
    """Row-input bounded kernel: the per-row bound arrives as a
    sublane-replicated (1, 1, 8, BQ) row (no q/k/v column concats on the
    host) and the softmax row sum is an in-kernel sublane reduce. Faster
    than the ones-column form when num_kv_blocks >= 2 (measured in
    scripts/studies/bench_attn_bnd2.py) and cuts ~5 host ops per call."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    s_t = jax.lax.dot_general(
        k_ref[0], q_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (BK, BQ)
    if mask_ref is not None:
        # additive pre-exp2 drop (see _bnd_kernel: avoids inf*0 NaN)
        s_t = s_t + (mask_ref[pl.program_id(0), ki] - 1.0) * (-NEG_INF)
    p_t = jnp.exp2(s_t - bound_ref[0, 0, :1, :])
    l_ref[:1, :] += jnp.sum(p_t, axis=0, keepdims=True)
    acc_ref[:] += jax.lax.dot_general(
        v_ref[0], p_t.astype(v_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (D, BQ)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        # see _bnd_kernel: floor below the smallest in-domain row sum
        o_ref[0] = (acc_ref[:]
                    / jnp.maximum(l_ref[:1, :], 1.2e-38)).astype(o_ref.dtype)


def _bnd2_masked_kernel(mask_ref, bound_ref, q_ref, k_ref, v_ref, o_ref,
                        acc_ref, l_ref, *, num_kv_blocks: int):
    _bnd2_kernel(bound_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref,
                 num_kv_blocks=num_kv_blocks, mask_ref=mask_ref)


def _online_t_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                     num_kv_blocks: int, mask_ref=None):
    """Transposed exact online softmax: per-q-row stats live on the LANE
    axis as (1, BQ) rows (native sublane broadcast). q pre-scaled by
    softmax_scale*log2(e); base-2 exp."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (BK, BQ)
    if mask_ref is not None:
        s_t = s_t + (mask_ref[pl.program_id(0), ki] - 1.0) * (-NEG_INF)
    m_prev = m_ref[:1, :]                             # (1, BQ)
    m_new = jnp.maximum(m_prev, jnp.max(s_t, axis=0, keepdims=True))
    p_t = jnp.exp2(s_t - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_ref[:1, :] * alpha + jnp.sum(p_t, axis=0, keepdims=True)
    pv_t = jax.lax.dot_general(
        v, p_t.astype(v.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (D, BQ)
    acc_ref[:] = acc_ref[:] * alpha + pv_t
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        o_ref[0] = (acc_ref[:]
                    / jnp.maximum(l_ref[:1, :], 1e-30)).astype(o_ref.dtype)


def _online_t_masked_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, acc_ref,
                            m_ref, l_ref, *, num_kv_blocks: int):
    _online_t_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                     num_kv_blocks=num_kv_blocks, mask_ref=mask_ref)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale: float, num_kv_blocks: int, mask_ref=None):
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
    if mask_ref is not None:
        # whole-block keep/drop flag: +0 when kept, -inf when dropped.
        # mask lives unblocked in SMEM: index by (batch*head, kv block).
        mb = mask_ref[pl.program_id(0), ki]
        s = s + (mb - 1.0) * (-NEG_INF)

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
        o_ref[0] = (acc_ref[:]
                    / jnp.maximum(l_ref[:, :1], 1e-20)).astype(o_ref.dtype)


def _masked_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref,
                   l_ref, *, scale: float, num_kv_blocks: int):
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  scale=scale, num_kv_blocks=num_kv_blocks,
                  mask_ref=mask_ref)


def _pick_block(size: int, preferred: int) -> Optional[int]:
    for b in (preferred, 1024, 512, 256, 128):
        if b <= size and size % b == 0:
            return b
    return None


def _choose_blocks(sq: int, skv: int, block_q: int, block_k: int,
                   variant: str = "grid"):
    """v5e sweeps (scripts/profile_unet.py, studies/bench_attn_v2.py,
    studies/bench_attn_ablate.py): bk=1024 everywhere. grid kernel: bq=1024 wins
    at sq>=4096, bq=512 at sq=1024. Transposed kernels (bnd/online_t):
    bq=1024 wins at every measured shape (attn3 L1 3.97 ms at
    bq1024/bk1024 vs 4.39 at bq512/bk1024). Callers' explicit larger
    block_q is kept."""
    if variant in ("bnd", "bnd_guard", "online_t"):
        bq_pref = max(block_q, 1024)
    else:
        bq_pref = max(block_q, 1024) if sq >= 4096 else block_q
    return _pick_block(sq, bq_pref), _pick_block(skv, block_k)


def _broadcast_mask(block_mask, b, h, num_kv_blocks):
    """(B, nk) -> (B*H, nk) so the SMEM mask indexes by grid i directly."""
    return jnp.broadcast_to(
        block_mask.astype(jnp.float32)[:, None, :],
        (b, h, num_kv_blocks)).reshape(b * h, num_kv_blocks)


def _bnd_domain_ok(qf32, k, limit: float = 120.0):
    """Sufficient condition for the bounded kernel's exp2 domain: the
    worst-row gap bound - max_logit <= max_i |q_i| * max_j |k_j - k_mean|
    (see _transposed_fwd docstring). qf32 is pre-scaled by scale*log2(e),
    so the product is already in exp2 units."""
    kf32 = k.astype(jnp.float32)
    k_mean = kf32.mean(axis=2, keepdims=True)
    rmax = jnp.sqrt(jnp.sum((kf32 - k_mean) ** 2, -1)).max()
    qmax = jnp.sqrt(jnp.sum(qf32 * qf32, -1)).max()
    return qmax * rmax <= limit


def _transposed_fwd(q, k, v, block_mask, scale, bq, bk, interpret, masked,
                    bounded, out_t=False, guard=False):
    """Driver for the "bnd"/"online_t" transposed kernels. Folds
    scale*log2(e) (and for bounded: the per-row logit bound and the
    row-sum ones column) into the operands; returns (B, H, Sq, D), or the
    kernel's NATIVE (B, H, D, Sq) when out_t=True (callers fold the head
    merge into the output projection instead of paying a relayout).

    guard=True ("bnd_guard"): clamp the bound's deviation term at 120
    exp2-units instead of branching. The softmax ratio is invariant to
    the per-row bound (numerator and denominator carry the same
    exp2(-bound_i) scaling), so ANY bound keeps the math exact as long
    as nothing over/underflows. Domain analysis: mean_j s_ij = q_i
    k_mean exactly (logits are linear in k) and max_j >= mean_j, so
    bound_i - max_j s_ij <= dev_i := |q_i| max_j|k_j - k_mean|. With
    dev clamped at 120 the row sum lies in [exp2(-120), skv *
    exp2(dev_i - 120)]: for dev_i <= 120 the clamp is a no-op (the old
    guarded domain, denominator floor 1e-38 < exp2(-120)); for 120 <
    dev_i <= ~128 + 120 - log2(skv) (~234 at the attn3 kv length) the
    clamp engages but the result is still the exact softmax; beyond
    that the sum overflows to inf and the rows go NaN — a LOUD failure,
    never the raw bnd kernel's silent all-zero rows. Unlike the former
    lax.cond fallback this costs no closed-call dispatch per attention
    site (~3 ms/step across the sampler's ~32 sites). For masked calls
    the centroid/deviation stats are computed over KEPT blocks only, so
    the same analysis holds relative to the keys that actually enter
    the row sum (a far-off dropped block cannot hoist the bound)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    nk = skv // bk
    grid = (b * h, sq // bq, nk)
    qf32 = q.astype(jnp.float32) * (scale * LOG2E)

    mask_args, mask_specs = (), ()
    if masked:
        mask_args = (_broadcast_mask(block_mask, b, h, nk),)
        mask_specs = (pl.BlockSpec(memory_space=pltpu.SMEM),)

    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))

    def run_online():
        qe = qf32.astype(q.dtype).reshape(b * h, sq, d)
        ke = k.reshape(b * h, skv, d)
        ve = v.reshape(b * h, skv, d)
        kern = _online_t_masked_kernel if masked else _online_t_kernel
        out = pl.pallas_call(
            functools.partial(kern, num_kv_blocks=nk),
            grid=grid,
            in_specs=[
                *mask_specs,
                pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
                pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
                pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0))],
            out_specs=pl.BlockSpec((1, d, bq), lambda i, j, kk: (i, 0, j)),
            out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
            scratch_shapes=[pltpu.VMEM((d, bq), jnp.float32),
                            pltpu.VMEM((8, bq), jnp.float32),
                            pltpu.VMEM((8, bq), jnp.float32)],
            compiler_params=params,
            interpret=interpret,
        )(*mask_args, qe, ke, ve)
        return out.reshape(b, h, d, sq)

    if bounded:
        # Per-row logit upper bound around the key centroid:
        # s_ij = q k_mean + q (k_j - k_mean) <= q k_mean + |q| max|k_j-k_mean|
        kf32 = k.astype(jnp.float32)
        if masked:
            # stats over KEPT kv only — the domain analysis is relative
            # to the keys that actually enter the row sum; a dropped
            # block's keys must not shift the centroid (a far-off masked
            # block would otherwise hoist the bound above every kept
            # logit and underflow kept rows)
            keep = jnp.repeat(block_mask.astype(jnp.float32), bk,
                              axis=1)[:, None, :, None]        # (b,1,skv,1)
            nkept = jnp.maximum(keep.sum(axis=2, keepdims=True), 1.0)
            k_mean = (kf32 * keep).sum(axis=2, keepdims=True) / nkept
            resid = jnp.sqrt(jnp.sum((kf32 - k_mean) ** 2, -1))
            rmax = (resid * keep[..., 0]).max(axis=2, keepdims=True)
        else:
            k_mean = kf32.mean(axis=2, keepdims=True)          # (b,h,1,d)
            resid = jnp.sqrt(jnp.sum((kf32 - k_mean) ** 2, -1))  # (b,h,skv)
            rmax = resid.max(axis=2, keepdims=True)            # (b,h,1)
        # bound_i - max_j s_ij <= dev_i, already in exp2 units
        dev = jnp.sqrt(jnp.sum(qf32 * qf32, -1)) * rmax  # (b,h,sq)
        if guard:
            # exactness-preserving clamp (see docstring) — no branch
            dev = jnp.minimum(dev, 120.0)
        bound = jnp.einsum("bhqd,bhkd->bhq", qf32, k_mean) + dev

        def run_bnd():
            if nk >= 2:
                # row-input form: no q/k/v column concats, row sum
                # in-kernel
                nq = sq // bq
                bound_rows = jnp.broadcast_to(
                    bound.reshape(b * h, nq, 1, bq), (b * h, nq, 8, bq))
                qe = qf32.astype(q.dtype).reshape(b * h, sq, d)
                ke = k.reshape(b * h, skv, d)
                ve = v.reshape(b * h, skv, d)
                kern = _bnd2_masked_kernel if masked else _bnd2_kernel
                out = pl.pallas_call(
                    functools.partial(kern, num_kv_blocks=nk),
                    grid=grid,
                    in_specs=[
                        *mask_specs,
                        pl.BlockSpec((1, 1, 8, bq),
                                     lambda i, j, kk: (i, j, 0, 0)),
                        pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
                        pl.BlockSpec((1, bk, d),
                                     lambda i, j, kk: (i, kk, 0)),
                        pl.BlockSpec((1, bk, d),
                                     lambda i, j, kk: (i, kk, 0))],
                    out_specs=pl.BlockSpec((1, d, bq),
                                           lambda i, j, kk: (i, 0, j)),
                    out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
                    scratch_shapes=[pltpu.VMEM((d, bq), jnp.float32),
                                    pltpu.VMEM((8, bq), jnp.float32)],
                    compiler_params=params,
                    interpret=interpret,
                )(*mask_args, bound_rows, qe, ke, ve)
                return out.reshape(b, h, d, sq)
            qe = jnp.concatenate(
                [qf32, -bound[..., None]], -1).astype(q.dtype)
            ones = jnp.ones((b, h, skv, 1), k.dtype)
            ke = jnp.concatenate([k, ones], -1)
            ve = jnp.concatenate([v, ones], -1)
            de = d + 1
            qe2 = qe.reshape(b * h, sq, de)
            ke2 = ke.reshape(b * h, skv, de)
            ve2 = ve.reshape(b * h, skv, de)
            kern = _bnd_masked_kernel if masked else _bnd_kernel
            out = pl.pallas_call(
                functools.partial(kern, d=d, num_kv_blocks=nk),
                grid=grid,
                in_specs=[
                    *mask_specs,
                    pl.BlockSpec((1, bq, de), lambda i, j, kk: (i, j, 0)),
                    pl.BlockSpec((1, bk, de), lambda i, j, kk: (i, kk, 0)),
                    pl.BlockSpec((1, bk, de), lambda i, j, kk: (i, kk, 0))],
                out_specs=pl.BlockSpec((1, d, bq),
                                       lambda i, j, kk: (i, 0, j)),
                out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
                scratch_shapes=[pltpu.VMEM((de, bq), jnp.float32)],
                compiler_params=params,
                interpret=interpret,
            )(*mask_args, qe2, ke2, ve2)
            return out.reshape(b, h, d, sq)

        out = run_bnd()
    else:
        out = run_online()
    return out if out_t else out.transpose(0, 1, 3, 2)


@functools.partial(jax.custom_vjp,
                   nondiff_argnames=("scale", "block_q", "block_k",
                                     "interpret", "masked", "variant",
                                     "out_t"))
def _flash_core(q, k, v, block_mask, scale, block_q, block_k, interpret,
                masked, variant, out_t=False):
    """block_mask: (B, num_kv_blocks) float32 (1 keep / 0 drop); a (1, 1)
    dummy when masked=False."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq, bk = _choose_blocks(sq, skv, block_q, block_k, variant)
    if bq is None or bk is None:
        raise ValueError(f"unsupported seq lens ({sq}, {skv})")

    if variant in ("bnd", "bnd_guard", "online_t"):
        return _transposed_fwd(q, k, v, block_mask, scale, bq, bk,
                               interpret, masked,
                               bounded=variant.startswith("bnd"),
                               out_t=out_t, guard=variant == "bnd_guard")

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    num_kv_blocks = skv // bk
    grid = (b * h, sq // bq, num_kv_blocks)

    qspec = pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0))
    kvspec = pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0))
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )
    if masked:
        bm = _broadcast_mask(block_mask, b, h, num_kv_blocks)
        out = pl.pallas_call(
            functools.partial(_masked_kernel, scale=scale,
                              num_kv_blocks=num_kv_blocks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B*H, nk)
                qspec, kvspec, kvspec,
            ],
            **common,
        )(bm, qf, kf, vf)
    else:
        out = pl.pallas_call(
            functools.partial(_flash_kernel, scale=scale,
                              num_kv_blocks=num_kv_blocks),
            in_specs=[qspec, kvspec, kvspec],
            **common,
        )(qf, kf, vf)
    out = out.reshape(b, h, sq, d)
    return out.transpose(0, 1, 3, 2) if out_t else out


# ---------------------------------------------------------------- backward
# Dedicated flash backward kernels. All logit-space math runs TRANSPOSED
# ((BK, BQ) instead of (BQ, BK)) so the per-q-row logsumexp and delta
# scalars live on the LANE axis as (1, BQ) rows — native sublane broadcast,
# no in-kernel relayouts. Toggle PALLAS_BACKWARD=False to fall back to the
# q-chunked XLA recompute.

PALLAS_BACKWARD = True


def _lse_kernel(q_ref, k_ref, lse_ref, m_ref, l_ref, *, scale: float,
                num_kv_blocks: int, mask_smem=None):
    """Recompute the forward row logsumexp, transposed: grid
    (BH, nq, nk); lse output block (1, BQ) on lanes."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    k = k_ref[0]
    q = q_ref[0]
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BK, BQ)
    if mask_smem is not None:
        s_t = s_t + (mask_smem[pl.program_id(0), ki] - 1.0) * (-NEG_INF)
    m_prev = m_ref[:1, :]                       # (1, BQ)
    m_new = jnp.maximum(m_prev, jnp.max(s_t, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_ref[:1, :] * alpha + jnp.sum(jnp.exp(s_t - m_new), axis=0,
                                           keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        lse = m_new + jnp.log(jnp.maximum(l_new, 1e-30))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               acc_ref, *, scale: float, num_kv_blocks: int,
               mask_smem=None):
    """dQ = scale * sum_k dS; grid (BH, nq, nk), kv innermost."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BK, BQ)
    if mask_smem is not None:
        s_t = s_t + (mask_smem[pl.program_id(0), ki] - 1.0) * (-NEG_INF)
    p_t = jnp.exp(s_t - lse_ref[0, 0, :1, :])         # (BK, BQ)
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (BK, BQ)
    ds_t = p_t * (dp_t - delta_ref[0, 0, :1, :])
    # dq^T += k^T @ ds: contract the BK axis; output (D, BQ) keeps D on
    # the MXU streaming axis (no 128-lane padding of the head dim)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        k, ds_t.astype(k.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (D, BQ)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, dk_ref,
                dv_ref, dk_acc, dv_acc, *, scale: float,
                num_q_blocks: int, mask_smem=None):
    """dK/dV accumulated over q blocks; grid (BH, nk, nq), q innermost."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]
    do = do_ref[0]
    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BK, BQ)
    if mask_smem is not None:
        s_t = s_t + (mask_smem[pl.program_id(0),
                               pl.program_id(1)] - 1.0) * (-NEG_INF)
    p_t = jnp.exp(s_t - lse_ref[0, 0, :1, :])
    # dv^T += do^T @ p: contract BQ; output (D, BK) streams D (no lane
    # padding of the head dim). Same for dk^T below.
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        do, p_t.astype(do.dtype), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (D, BK)
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds_t = p_t * (dp_t - delta_ref[0, 0, :1, :])
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        q, ds_t.astype(q.dtype), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (D, BK)

    @pl.when(qi == num_q_blocks - 1)
    def _fin():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _pallas_bwd_with_out(q, k, v, block_mask, out, g, scale, bq, bk,
                         interpret, masked):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bh = b * h
    nq, nk = sq // bq, skv // bk
    qf = q.reshape(bh, sq, d)
    kf = k.reshape(bh, skv, d)
    vf = v.reshape(bh, skv, d)
    gf = g.reshape(bh, sq, d)
    delta = jnp.sum(gf.astype(jnp.float32) * out.reshape(bh, sq, d)
                    .astype(jnp.float32), axis=-1)  # (BH, Sq)
    # Mosaic tiling wants (sublane, lane) block dims divisible by (8, 128):
    # carry per-row scalars as (BH, nq, 8, BQ) sublane-replicated tiles
    delta = jnp.broadcast_to(
        delta.reshape(bh, sq // bq, 1, bq), (bh, sq // bq, 8, bq))

    mask_args, mask_specs = (), ()
    if masked:
        bm = jnp.broadcast_to(block_mask.astype(jnp.float32)[:, None, :],
                              (b, h, nk)).reshape(bh, nk)
        mask_args = (bm,)
        mask_specs = (pl.BlockSpec(memory_space=pltpu.SMEM),)

    def with_mask(kernel, **kw):
        if masked:
            def wrapped(m, *refs, _k=kernel, **kw2):
                return _k(*refs, mask_smem=m, **kw2)
            return functools.partial(wrapped, **kw)
        return functools.partial(kernel, **kw)

    qspec_j = pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0))
    kvspec_kk = pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0))
    kvspec_j = pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, j, 0))
    qspec_kk = pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, kk, 0))
    row_j = pl.BlockSpec((1, 1, 8, bq), lambda i, j, kk: (i, j, 0, 0))
    row_kk = pl.BlockSpec((1, 1, 8, bq), lambda i, j, kk: (i, kk, 0, 0))

    # 1. recompute forward logsumexp (transposed layout)
    lse = pl.pallas_call(
        with_mask(_lse_kernel, scale=scale, num_kv_blocks=nk),
        grid=(bh, nq, nk),
        in_specs=[*mask_specs, qspec_j, kvspec_kk],
        out_specs=row_j,
        out_shape=jax.ShapeDtypeStruct((bh, nq, 8, bq), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bq), jnp.float32),
                        pltpu.VMEM((8, bq), jnp.float32)],
        interpret=interpret,
    )(*mask_args, qf, kf)

    # 2. dQ — output transposed (BH, D, Sq): D on the streaming axis
    dq = pl.pallas_call(
        with_mask(_dq_kernel, scale=scale, num_kv_blocks=nk),
        grid=(bh, nq, nk),
        in_specs=[*mask_specs, qspec_j, kvspec_kk, kvspec_kk, qspec_j,
                  row_j, row_j],
        out_specs=pl.BlockSpec((1, d, bq), lambda i, j, kk: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((bh, d, sq), q.dtype),
        scratch_shapes=[pltpu.VMEM((d, bq), jnp.float32)],
        interpret=interpret,
    )(*mask_args, qf, kf, vf, gf, lse, delta)

    # 3. dK, dV — outputs transposed (BH, D, Skv)
    kvspec_t = pl.BlockSpec((1, d, bk), lambda i, j, kk: (i, 0, j))
    dk, dv = pl.pallas_call(
        with_mask(_dkv_kernel, scale=scale, num_q_blocks=nq),
        grid=(bh, nk, nq),
        in_specs=[*mask_specs, kvspec_j, kvspec_j, qspec_kk, qspec_kk,
                  row_kk, row_kk],
        out_specs=(kvspec_t, kvspec_t),
        out_shape=(jax.ShapeDtypeStruct((bh, d, skv), k.dtype),
                   jax.ShapeDtypeStruct((bh, d, skv), v.dtype)),
        scratch_shapes=[pltpu.VMEM((d, bk), jnp.float32),
                        pltpu.VMEM((d, bk), jnp.float32)],
        interpret=interpret,
    )(*mask_args, kf, vf, qf, gf, lse, delta)

    return (dq.reshape(b, h, d, sq).transpose(0, 1, 3, 2),
            dk.reshape(b, h, d, skv).transpose(0, 1, 3, 2),
            dv.reshape(b, h, d, skv).transpose(0, 1, 3, 2))


def _core_fwd(q, k, v, block_mask, scale, block_q, block_k, interpret,
              masked, variant, out_t=False):
    out = _flash_core(q, k, v, block_mask, scale, block_q, block_k,
                      interpret, masked, variant, out_t)
    return out, (q, k, v, block_mask, out)


def _core_bwd(scale, block_q, block_k, interpret, masked, variant, out_t,
              res, g):
    """Flash backward: dedicated Pallas kernels (PALLAS_BACKWARD) or a
    q-chunked XLA recompute fallback (peak live logits (B, H, 512, Skv)).
    When the forward produced the native (B, H, D, Sq) layout (out_t), the
    residual out and cotangent g are relaid to (B, H, Sq, D) here — the
    same transpose the forward no longer pays."""
    q, k, v, block_mask, out = res
    if out_t:
        out = out.transpose(0, 1, 3, 2)
        g = g.transpose(0, 1, 3, 2)
    if PALLAS_BACKWARD:
        bq, bk = _choose_blocks(q.shape[2], k.shape[2], block_q, block_k)
        dq, dk, dv = _pallas_bwd_with_out(q, k, v, block_mask, out, g,
                                          scale, bq, bk, interpret, masked)
        return dq, dk, dv, jnp.zeros_like(block_mask)
    return _xla_chunked_bwd(scale, block_q, block_k, interpret, masked,
                            (q, k, v, block_mask), g)


def _xla_chunked_bwd(scale, block_q, block_k, interpret, masked, res, g):
    """Memory-bounded backward: the standard attention gradient
    (dV = P^T g; dP = g V^T; dS = P (dP - rowsum(dP P)); dQ = dS K s;
    dK = dS^T Q s) recomputed in q-chunks under lax.scan, so the peak
    live logits buffer is (B, H, CHUNK, Skv) instead of (B, H, Sq, Skv).
    fp32 softmax statistics; bf16 matmul inputs."""
    q, k, v, block_mask = res
    b, h, sq, d = q.shape
    skv = k.shape[2]
    chunk = min(512, sq)
    n_chunks = sq // chunk
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if masked:
        bk = skv // block_mask.shape[1]
        kv_mask = jnp.repeat(block_mask.astype(jnp.float32), bk, axis=1)
        bias = (kv_mask - 1.0)[:, None, None, :] * (-NEG_INF)  # (B,1,1,K)
    else:
        bias = None

    q_c = q.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)
    g_c = g.reshape(b, h, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)

    def body(carry, qg):
        dk_acc, dv_acc = carry
        qc, gc = qg
        qcf = qc.astype(jnp.float32)
        gcf = gc.astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qcf, kf,
                       preferred_element_type=jnp.float32) * scale
        if bias is not None:
            s = s + bias
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
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(res[3]))


_flash_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: float = 1.0, block_q: int = 512,
                    block_k: int = 1024, interpret: bool = False,
                    block_mask: Optional[jax.Array] = None,
                    variant: Optional[str] = None,
                    out_layout: str = "bhsd") -> jax.Array:
    """Fused attention over (B, H, S, D) tensors.

    block_mask: optional (B, Skv // block_k) keep-flags (bool/0-1); each
    kv block is wholly kept or dropped (the ref-frame mask granularity).
    Requires Sq % block_q == 0 and Skv % block_k == 0 after auto-shrink;
    gate with `flash_supported` / `ref_mask_block_k`.

    variant: "bnd_guard" (bounded kernel with the deviation-term clamp:
    exact in and well past the raw domain, NaN-loud beyond; the
    default), "bnd", "online_t", or "grid" — see the module docstring.
    None uses the module default FORWARD_VARIANT.

    out_layout: "bhsd" (default) or "bhds" — the transposed kernels write
    (B, H, D, Sq) natively; "bhds" returns that layout so callers can fold
    the head merge into the output projection (a K-major GEMM) instead of
    paying a relayout copy.
    """
    if variant is None:
        variant = FORWARD_VARIANT
    assert variant in ("bnd", "bnd_guard", "online_t", "grid"), variant
    masked = block_mask is not None
    if not masked:
        block_mask = jnp.ones((1, 1), jnp.float32)
    else:
        skv = k.shape[2]
        bk = _pick_block(skv, block_k)
        if bk is None or skv // bk != block_mask.shape[1]:
            raise ValueError(
                f"block_mask has {block_mask.shape[1]} blocks but kv len "
                f"{skv} tiles into {None if bk is None else skv // bk}")
    assert out_layout in ("bhsd", "bhds"), out_layout
    return _flash_core(q, k, v, block_mask.astype(jnp.float32), scale,
                       block_q, block_k, interpret, masked, variant,
                       out_layout == "bhds")


def flash_supported(sq: int, skv: int, has_mask: bool,
                    min_flops: int = 1 << 20) -> bool:
    """Flash pays off when the logits matrix is big enough to be
    HBM-bound and blocks divide the sequence lengths. `has_mask` refers to
    arbitrary elementwise masks (not block-aligned ref masks, which stay
    on the flash path via `block_mask`).

    Threshold from v5e measurements (scripts/profile_unet.py, bq=512
    bk=1024): 4096x4096 1.75x, 4096x12288 2.5x, 1024x3072 1.25x,
    1024x1024 1.15x faster than XLA; smaller shapes favor XLA."""
    if has_mask:
        return False
    if sq * skv < min_flops:
        return False
    return (_pick_block(sq, 512) is not None
            and _pick_block(skv, 1024) is not None)


def ref_mask_block_k(skv: int, num_refs: int) -> Optional[int]:
    """Pick a kv block size that tiles each reference's span exactly, so a
    per-ref mask is constant per block. None if not representable."""
    if skv % num_refs:
        return None
    span = skv // num_refs
    return _pick_block(span, 1024)
