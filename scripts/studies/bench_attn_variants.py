"""Micro-bench flash-attention forward variants on the real chip.

Round-2 MFU work (VERDICT.md next-round #2): attn3 L1 (4096x12288, d40)
measured ~37 TFLOP/s vs a ~62 TFLOP/s d=40 ceiling. Hypotheses tested
here, each as a kernel variant:

  base     repo kernel (ops/pallas_attention.py) as shipped
  ds       + dimension_semantics=(parallel, parallel, arbitrary)
  scale    + fold softmax scale into q on the host (kills 1 VPU op/logit)
  exp2     + base-2 softmax (exp2 is the VPU native; fold log2e into scale)
  split2   + q block split into two interleaved halves so the VLIW
             scheduler can overlap half A's softmax (VPU) with half B's
             QK/PV dots (MXU) inside one grid step
  bk2048   scale variant with 2048-wide kv blocks (fewer rescale steps)

Usage: python scripts/bench_attn_variants.py [iters]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NEG_INF = -1e30
P = ("parallel", "parallel", "arbitrary")


def _variant_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                    scale, num_kv_blocks, use_exp2, split2):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    exp = jnp.exp2 if use_exp2 else jnp.exp
    k = k_ref[0]
    v = v_ref[0]
    bq = q_ref.shape[1]
    halves = 2 if split2 else 1
    hq = bq // halves
    for h in range(halves):
        sl = slice(h * hq, (h + 1) * hq)
        q = q_ref[0, sl, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale is not None:
            s = s * scale
        m_prev = m_ref[sl, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = exp(s - m_new)
        alpha = exp(m_prev - m_new)
        l_new = l_ref[sl, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[sl, :] = acc_ref[sl, :] * alpha + pv
        m_ref[sl, :] = jnp.broadcast_to(m_new, (hq, m_ref.shape[1]))
        l_ref[sl, :] = jnp.broadcast_to(l_new, (hq, l_ref.shape[1]))

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:]
                    / jnp.maximum(l_ref[:, :1], 1e-20)).astype(o_ref.dtype)


def variant_attention(q, k, v, *, sm_scale, bq, bk, fold_scale, use_exp2,
                      split2, use_ds):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if fold_scale:
        eff = sm_scale * (1.4426950408889634 if use_exp2 else 1.0)
        q = (q.astype(jnp.float32) * eff).astype(q.dtype)
        kscale = None
    else:
        assert not use_exp2
        kscale = sm_scale
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    nk = skv // bk
    kw = {}
    if use_ds:
        kw["compiler_params"] = pltpu.CompilerParams(dimension_semantics=P)
    out = pl.pallas_call(
        functools.partial(_variant_kernel, scale=kscale, num_kv_blocks=nk,
                          use_exp2=use_exp2, split2=split2),
        grid=(b * h, sq // bq, nk),
        in_specs=[pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
                  pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0)),
                  pl.BlockSpec((1, bk, d), lambda i, j, kk: (i, kk, 0))],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32)],
        **kw,
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d)


def sync_time(fn, *args, iters=10):
    jax.device_get(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from storygen_tpu.ops.pallas_attention import flash_attention

    shapes = [
        ("attn3_L1", 3, 8, 4096, 12288, 40),
        ("attn1_L1_ref", 6, 8, 4096, 4096, 40),
        ("attn1_L1_main", 3, 8, 4096, 4096, 40),
    ]
    variants = [
        ("base", None),
        ("ds", dict(fold_scale=False, use_exp2=False, split2=False,
                    use_ds=True)),
        ("ds+scale", dict(fold_scale=True, use_exp2=False, split2=False,
                          use_ds=True)),
        ("ds+exp2", dict(fold_scale=True, use_exp2=True, split2=False,
                         use_ds=True)),
        ("ds+exp2+split2", dict(fold_scale=True, use_exp2=True, split2=True,
                                use_ds=True)),
        ("ds+exp2+bk2048", dict(fold_scale=True, use_exp2=True, split2=False,
                                use_ds=True)),
    ]
    rng = jax.random.PRNGKey(0)
    for name, b, h, sq, skv, d in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
        sm = d ** -0.5
        flops = 4 * b * h * sq * skv * d
        ref = None
        for vname, cfg in variants:
            bq = 1024
            bk = 2048 if (cfg and "bk2048" in vname) else 1024
            if cfg is None:
                fn = jax.jit(functools.partial(flash_attention, scale=sm))
            else:
                fn = jax.jit(functools.partial(
                    variant_attention, sm_scale=sm, bq=bq, bk=bk, **cfg))
            try:
                out = fn(q, k, v)
                if ref is None:
                    ref = out.astype(jnp.float32)
                else:
                    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                                - ref)))
                    assert err < 0.02, (name, vname, err)
                dt = sync_time(fn, q, k, v, iters=iters)
                print(f"{name:15s} {vname:16s} {dt*1e3:7.2f} ms "
                      f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:15s} {vname:16s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


def sweep():
    """Block-size sweep at the ds+scale config (winner of main())."""
    rng = jax.random.PRNGKey(0)
    shapes = [
        ("attn3_L1", 3, 8, 4096, 12288, 40),
        ("attn1_L1_ref", 6, 8, 4096, 4096, 40),
        ("attn1_L1_main", 3, 8, 4096, 4096, 40),
        ("attn3_L2", 3, 8, 1024, 3072, 80),
        ("attn1_L2_ref", 6, 8, 1024, 1024, 80),
    ]
    for name, b, h, sq, skv, d in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
        sm = d ** -0.5
        flops = 4 * b * h * sq * skv * d
        for bq in (512, 1024, 2048, 4096):
            if bq > sq or sq % bq:
                continue
            for bk in (1024, 2048, 4096):
                if bk > skv or skv % bk:
                    continue
                fn = jax.jit(functools.partial(
                    variant_attention, sm_scale=sm, bq=bq, bk=bk,
                    fold_scale=True, use_exp2=False, split2=False,
                    use_ds=True))
                try:
                    dt = sync_time(fn, q, k, v, iters=10)
                    print(f"{name:14s} bq={bq:4d} bk={bk:4d} {dt*1e3:7.2f}"
                          f" ms {flops/dt/1e12:6.1f} TFLOP/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{name:14s} bq={bq:4d} bk={bk:4d} FAILED "
                          f"{type(e).__name__}: {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    else:
        main()
