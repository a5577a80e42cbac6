"""Feasibility microbench: int8 qk for the d=40 attention wall.

The production flash kernels sit within ~15% of the Mosaic floor for
their shapes, and that floor is the d=40 contraction-depth MXU bound:
40/128 of the 197 TF/s bf16 peak = 61.5 TF/s (BENCH.md roofline). The
v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS peak),
and the depth-padding penalty applies identically, so an int8 qk dot has
a 123 TOPS bound — potentially ~2x on the ~34 ms/step attention buckets.

This study answers, before any kernel investment:
  1. does Mosaic accept an int8 matmul in a Pallas kernel on this chip,
  2. what the measured int8 qk throughput is vs the bf16 qk at the two
     dominant shapes (attn3_L1 4096x12288, attn1_L1 4096^2, d=40),
  3. what the full candidate pipeline costs (int8 qk + per-row dequant
     scales + exp2 + bf16 PV) vs the production bnd kernel's ablated
     bf16 qk+exp+pv.

Quantization model (what a production variant would do): per-row absmax
int8 for q and k (rows are D=40 vectors), dequant as a rank-1 outer
scale on the (BK, BQ) logit block — two VPU broadcast multiplies. PV
stays bf16 (p is a fresh bf16 tensor either way).

Usage: python scripts/studies/bench_attn_int8.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DS = ("parallel", "parallel", "arbitrary")
LOG2E = 1.4426950408889634


def _qk_kernel(q_ref, k_ref, o_ref, acc_ref, *, num_kv_blocks, int8):
    """Bare qk dot; accumulates a reduction so nothing is DCE'd."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if int8:
        s = jax.lax.dot_general(
            k_ref[0], q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # (BK, BQ) int32
        acc_ref[:] += jnp.sum(s, axis=0, keepdims=True).astype(jnp.float32)
    else:
        s = jax.lax.dot_general(
            k_ref[0], q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.sum(s, axis=0, keepdims=True)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def qk_only(q_t, k, *, bq, bk, int8):
    """q_t: (BH, D, Sq) pre-transposed; k: (BH, Skv, D)."""
    bh, d, sq = q_t.shape
    skv = k.shape[1]
    nk = skv // bk
    return pl.pallas_call(
        functools.partial(_qk_kernel, num_kv_blocks=nk, int8=int8),
        grid=(bh, sq // bq, nk),
        in_specs=[
            pl.BlockSpec((1, d, bq), lambda i, j, kk: (i, 0, j)),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0))],
        out_specs=pl.BlockSpec((1, 1, bq), lambda i, j, kk: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=DS),
    )(q_t, k)


def _full_int8_kernel(sq_ref, sk_ref, bnd_ref, q_ref, k_ref, v_ref,
                      o_ref, acc_ref, *, d, num_kv_blocks):
    """Candidate production pipeline: int8 qk -> rank-1 dequant ->
    bound shift -> exp2 -> bf16 PV (transposed, ones-column row sum)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s32 = jax.lax.dot_general(
        k_ref[0], q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # (BK, BQ)
    # dequant: logits = s32 * sk[row] * sq[col] (absmax scales, already
    # multiplied by softmax_scale*log2e on the q side), minus the
    # per-row bound (exp2 units). sk block is (BK, 1) (sublane vector),
    # sq/bnd blocks are (1, BQ) (lane vectors) — both plain broadcasts.
    s = (s32.astype(jnp.float32) * sk_ref[0] * sq_ref[0]
         - bnd_ref[0])
    p_t = jnp.exp2(s)
    acc_ref[:] += jax.lax.dot_general(
        v_ref[0], p_t.astype(v_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (D+1, BQ)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        o_ref[0] = (acc_ref[:d, :]
                    / jnp.maximum(acc_ref[d:d + 1, :], 1.2e-38)
                    ).astype(o_ref.dtype)


def full_int8(q, k, v, *, sm_scale, bq, bk):
    """Quantize on host (the production variant would fuse this into the
    projection epilogue; here it is timed inside the jit to be honest
    about total cost)."""
    b, h, s_q, d = q.shape
    skv = k.shape[2]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_amax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-12
    k_amax = jnp.max(jnp.abs(kf), axis=-1, keepdims=True) + 1e-12
    q_i8 = jnp.round(qf / q_amax * 127.0).astype(jnp.int8)
    k_i8 = jnp.round(kf / k_amax * 127.0).astype(jnp.int8)
    sq_row = (q_amax[..., 0] / 127.0) * (sm_scale * LOG2E)   # (B,H,Sq)
    sk_row = k_amax[..., 0] / 127.0                          # (B,H,Skv)
    # per-row logit bound from the QUANTIZED values (sound for the int8
    # logits): |s_row| <= sq*sk_max * 127 * |q_i8 . k_i8|_bound; use the
    # same Cauchy-Schwarz form the bnd kernel uses, on dequantized rows
    qd = q_i8.astype(jnp.float32) * sq_row[..., None]
    kd = k_i8.astype(jnp.float32) * sk_row[..., None]
    kmax = jnp.sqrt((kd * kd).sum(-1)).max(axis=2, keepdims=True)
    bound = jnp.sqrt((qd * qd).sum(-1)) * kmax               # (B,H,Sq)

    q_t = q_i8.reshape(b * h, s_q, d).transpose(0, 2, 1)
    ke = k_i8.reshape(b * h, skv, d)
    ones_k = jnp.ones((b, h, skv, 1), v.dtype)
    ve = jnp.concatenate([v, ones_k], -1).reshape(b * h, skv, d + 1)
    sq_in = sq_row.reshape(b * h, 1, s_q)
    sk_in = sk_row.reshape(b * h, skv, 1)
    bnd_in = bound.reshape(b * h, 1, s_q)
    nk = skv // bk
    out = pl.pallas_call(
        functools.partial(_full_int8_kernel, d=d, num_kv_blocks=nk),
        grid=(b * h, s_q // bq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq), lambda i, j, kk: (i, 0, j)),
            pl.BlockSpec((1, bk, 1), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, 1, bq), lambda i, j, kk: (i, 0, j)),
            pl.BlockSpec((1, d, bq), lambda i, j, kk: (i, 0, j)),
            pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, bk, d + 1), lambda i, j, kk: (i, kk, 0))],
        out_specs=pl.BlockSpec((1, d, bq), lambda i, j, kk: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, s_q), v.dtype),
        scratch_shapes=[pltpu.VMEM((d + 1, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=DS),
    )(sq_in, sk_in, bnd_in, q_t, ke, ve)
    return out.reshape(b, h, d, s_q).transpose(0, 1, 3, 2)


def xla_attn(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def scan_time(fn, *args, n=20):
    a0 = args[0]
    a0s = jnp.stack([a0 + jnp.asarray(1e-6 * i, a0.dtype)
                     for i in range(n)]) if a0.dtype != jnp.int8 else \
        jnp.stack([a0 for _ in range(n)])

    @jax.jit
    def run(a0s, *rest):
        def body(acc, ai):
            out = fn(ai, *rest)
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), a0s)
        return acc

    jax.device_get(run(a0s, *args[1:]))
    t0 = time.perf_counter()
    jax.device_get(run(a0s, *args[1:]))
    return (time.perf_counter() - t0) / n


def main():
    print(f"devices: {jax.devices()}")
    shapes = [
        ("attn3_L1", 3, 8, 4096, 12288, 40),
        ("attn1_L1_ref", 6, 8, 4096, 4096, 40),
    ]
    rng = jax.random.PRNGKey(0)
    for name, b, h, sq, skv, d in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
        sm = d ** -0.5
        qk_flops = 2 * b * h * sq * skv * d
        attn_flops = 4 * b * h * sq * skv * d
        print(f"\n== {name} b{b} h{h} {sq}x{skv} d{d} "
              f"(qk {qk_flops/1e12:.2f} TFLOP) ==")

        # accuracy of the full int8 pipeline vs fp32 reference
        ref = xla_attn(q.astype(jnp.float32), k.astype(jnp.float32),
                       v.astype(jnp.float32), sm)
        bf16_out = xla_attn(q, k, v, sm).astype(jnp.float32)
        bq, bk = 1024, 1024 if skv % 1024 == 0 else 512
        try:
            i8_out = full_int8(q, k, v, sm_scale=sm, bq=bq,
                               bk=bk).astype(jnp.float32)
            err_i8 = jnp.abs(i8_out - ref).max()
            err_bf = jnp.abs(bf16_out - ref).max()
            rel_i8 = (jnp.abs(i8_out - ref).mean()
                      / (jnp.abs(ref).mean() + 1e-12))
            print(f"  maxerr vs fp32: bf16 {float(err_bf):.4g}  "
                  f"int8 {float(err_i8):.4g}  (int8 mean-rel "
                  f"{float(rel_i8):.4g})")
        except Exception as e:
            print(f"  full_int8 FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")

        q_t_bf = (q.reshape(b * h, sq, d).transpose(0, 2, 1))
        k_bf = k.reshape(b * h, skv, d)
        q_i8 = jnp.clip(jnp.round(q.astype(jnp.float32) * 32), -127,
                        127).astype(jnp.int8)
        k_i8 = jnp.clip(jnp.round(k.astype(jnp.float32) * 32), -127,
                        127).astype(jnp.int8)
        q_t_i8 = q_i8.reshape(b * h, sq, d).transpose(0, 2, 1)
        k_i8r = k_i8.reshape(b * h, skv, d)

        for tag, fn, args in [
            ("qk bf16", functools.partial(qk_only, bq=bq, bk=bk,
                                          int8=False), (q_t_bf, k_bf)),
            ("qk int8", functools.partial(qk_only, bq=bq, bk=bk,
                                          int8=True), (q_t_i8, k_i8r)),
            ("full int8 (quant in-jit)",
             functools.partial(full_int8, sm_scale=sm, bq=bq, bk=bk),
             (q, k, v)),
        ]:
            try:
                t = scan_time(fn, *args)
                fl = qk_flops if tag.startswith("qk") else attn_flops
                print(f"  {tag:26} {t*1e3:8.3f} ms  {fl/t/1e12:7.1f} "
                      f"T{'OP' if 'int8' in tag else 'F'}/s")
            except Exception as e:
                print(f"  {tag:26} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
