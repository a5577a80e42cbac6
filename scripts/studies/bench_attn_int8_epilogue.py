"""int8-qk productionization study, part 2 (VERDICT r4 #6): fold the
per-row absmax quantization of q/k into the PROJECTION GEMM epilogue and
measure the honest end-to-end attention bucket (q/k projections + core
attention) bf16 vs int8.

Part 1 (bench_attn_int8.py, BENCH.md) measured: bare int8 qk gains
1.34-1.36x over bf16 qk, but STANDALONE in-jit quantization of q/k costs
more than the qk saving (full pipeline 4.77 ms vs 2.97 ms bf16 at
attn3_L1). The deferred plan was to fold quantization into the q/k
projection GEMMs so the quant math rides the GEMM's output pass instead
of re-reading q/k from HBM. Here both pipelines are measured as ONE jit
each, scan-amortized, at the sampler's two dominant shapes:

  bf16 path:  q = x @ Wq ; k = c @ Wk ; bnd-style flash fwd (transposed)
  int8 path:  (q8, sq) = quant(x @ Wq) ; (k8, sk) = quant(c @ Wk) ;
              int8-qk flash fwd (rank-1 dequant in-kernel)

where quant() is per-(row, head) absmax int8 over the d=40 head segment,
written INSIDE the same jit so XLA can fuse it into the GEMM epilogue
(no separate HBM roundtrip of q/k is structurally required: the scales
reduction and the int8 cast consume the GEMM result directly).

Decision rule (VERDICT r4 #6): production requires >= 1.2x on this
bucket AND a QUALITY.md pass at the ~0.7% mean-rel per-attention error;
below that the study documents a kill.

Usage: python scripts/studies/bench_attn_int8_epilogue.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.studies.bench_attn_int8 import (LOG2E, full_int8,  # noqa: E402
                                             xla_attn)
from storygen_tpu.ops.pallas_attention import _flash_core  # noqa: E402


def quant_heads(y, h, d):
    """(R, H*D) GEMM output -> int8 (R, H, D) + fp32 scales (R, H).

    Per-(row, head) absmax over the d-wide head segment; written as a
    consumer of the GEMM output so XLA fuses it into the epilogue."""
    r = y.shape[0]
    yh = y.reshape(r, h, d).astype(jnp.float32)
    amax = jnp.max(jnp.abs(yh), axis=-1, keepdims=True) + 1e-12
    y8 = jnp.round(yh / amax * 127.0).astype(jnp.int8)
    return y8, amax[..., 0] / 127.0


def int8_attn_from_quant(q8, sq_row, k8, sk_row, v, *, sm_scale, bq, bk):
    """The part-1 kernel, fed PRE-quantized q/k (+ scales). Mirrors
    full_int8() minus the quantization (which lives in the projection
    epilogue here); bound stats from the dequantized rows."""
    import numpy as np  # noqa: F401
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from scripts.studies.bench_attn_int8 import _full_int8_kernel
    b, h, s_q, d = q8.shape
    skv = k8.shape[2]
    sq_row = sq_row * (sm_scale * LOG2E)
    qd = q8.astype(jnp.float32) * sq_row[..., None]
    kd = k8.astype(jnp.float32) * sk_row[..., None]
    kmax = jnp.sqrt((kd * kd).sum(-1)).max(axis=2, keepdims=True)
    bound = jnp.sqrt((qd * qd).sum(-1)) * kmax
    q_t = q8.reshape(b * h, s_q, d).transpose(0, 2, 1)
    ke = k8.reshape(b * h, skv, d)
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(sq_in, sk_in, bnd_in, q_t, ke, ve)
    return out.reshape(b, h, d, s_q).transpose(0, 1, 3, 2)


def scan_time(fn, x0, *rest, n=20):
    xs = jnp.stack([x0 + jnp.asarray(1e-6 * i, x0.dtype) for i in range(n)])

    @jax.jit
    def run(xs, *rest):
        def body(acc, xi):
            out = fn(xi, *rest)
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jax.device_get(run(xs, *rest))
    t0 = time.perf_counter()
    jax.device_get(run(xs, *rest))
    return (time.perf_counter() - t0) / n


def main():
    print(f"devices: {jax.devices()}")
    # (name, b, h, sq, skv, d): the two dominant sampler shapes
    shapes = [("attn3_L1", 3, 8, 4096, 12288, 40),
              ("attn1_L1", 6, 8, 4096, 4096, 40)]
    bq, bk = 1024, 1024
    for name, b, h, sq, skv, d in shapes:
        c = h * d
        rng = jax.random.split(jax.random.PRNGKey(0), 6)
        x = jax.random.normal(rng[0], (b * sq, c), jnp.bfloat16)
        ctx = jax.random.normal(rng[1], (b * skv, c), jnp.bfloat16)
        wq = jax.random.normal(rng[2], (c, c), jnp.bfloat16) * 0.03
        wk = jax.random.normal(rng[3], (c, c), jnp.bfloat16) * 0.03
        v = jax.random.normal(rng[4], (b, h, skv, d), jnp.bfloat16)
        scale = 1.0 / (d ** 0.5)

        def heads(y, s, pb=b):
            return y.reshape(pb, s, h, d).transpose(0, 2, 1, 3)

        def bf16_path(x, ctx, wq, wk, v):
            q = heads(jnp.dot(x, wq), sq)
            k = heads(jnp.dot(ctx, wk), skv)
            mask = jnp.ones((1, 1), jnp.float32)
            return _flash_core(q, k, v, mask, scale, bq, bk, False,
                               False, "bnd", False)

        def int8_path(x, ctx, wq, wk, v):
            q8, sqs = quant_heads(jnp.dot(x, wq), h, d)
            k8, sks = quant_heads(jnp.dot(ctx, wk), h, d)
            q8 = heads(q8.reshape(b * sq, c), sq)
            k8 = heads(k8.reshape(b * skv, c), skv)
            sq_row = sqs.reshape(b, sq, h).transpose(0, 2, 1)
            sk_row = sks.reshape(b, skv, h).transpose(0, 2, 1)
            return int8_attn_from_quant(q8, sq_row, k8, sk_row, v,
                                        sm_scale=scale, bq=bq, bk=bk)

        t_bf16 = scan_time(bf16_path, x, ctx, wq, wk, v)
        t_int8 = scan_time(int8_path, x, ctx, wq, wk, v)

        # numerics vs fp32 XLA reference (quality-error context)
        qf = heads(jnp.dot(x, wq), sq).astype(jnp.float32)
        kf = heads(jnp.dot(ctx, wk), skv).astype(jnp.float32)
        ref = xla_attn(qf, kf, v.astype(jnp.float32), scale)
        got = int8_path(x, ctx, wq, wk, v).astype(jnp.float32)
        err = jnp.abs(got - ref)
        rel = (err.mean() / jnp.abs(ref).mean()).item()

        print(f"{name}: bf16 proj+bnd {t_bf16 * 1e3:.3f} ms | "
              f"int8 proj+quant-epilogue+kernel {t_int8 * 1e3:.3f} ms | "
              f"ratio {t_bf16 / t_int8:.3f}x | int8 mean-rel err "
              f"{rel * 100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
