"""Multi-head-per-grid-cell bounded flash for the small-seq shapes.

attn3_L2 (1024x3072 d80 b3) runs at ~17 TF/s: only 24*1*3 = 72 grid
cells, so per-cell pipeline fill/drain dominates. Folding G heads into one
cell (3D blocks, in-kernel unrolled loop) gives fewer, fatter cells.

Usage: python scripts/bench_attn_multihead.py
"""
import functools
import os
import sys

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

LOG2E = 1.4426950408889634
DS = ("parallel", "parallel", "arbitrary")


def _mh_kernel(bound_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *,
               num_kv_blocks, g):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    for h in range(g):
        s_t = jax.lax.dot_general(
            k_ref[h], q_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p_t = jnp.exp2(s_t - bound_ref[h, 0, :1, :])
        l_ref[h:h + 1, :] += jnp.sum(p_t, axis=0, keepdims=True)
        acc_ref[h] += jax.lax.dot_general(
            v_ref[h], p_t.astype(v_ref.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        for h in range(g):
            o_ref[h] = (acc_ref[h]
                        / jnp.maximum(l_ref[h:h + 1, :], 1e-30)
                        ).astype(o_ref.dtype)


def mh_attention(q, k, v, *, sm_scale, bq=1024, bk=1024, g=2):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf32 = q.astype(jnp.float32) * (sm_scale * LOG2E)
    kf32 = k.astype(jnp.float32)
    k_mean = kf32.mean(axis=2, keepdims=True)
    rmax = jnp.sqrt(jnp.sum((kf32 - k_mean) ** 2, -1)).max(
        axis=2, keepdims=True)
    bound = (jnp.einsum("bhqd,bhkd->bhq", qf32, k_mean)
             + jnp.sqrt(jnp.sum(qf32 * qf32, -1)) * rmax)
    nq, nk = sq // bq, skv // bk
    bh = b * h
    bound_rows = jnp.broadcast_to(
        bound.reshape(bh, nq, 1, bq), (bh, nq, 8, bq))
    qe = qf32.astype(q.dtype).reshape(bh, sq, d)
    ke = k.reshape(bh, skv, d)
    ve = v.reshape(bh, skv, d)
    out = pl.pallas_call(
        functools.partial(_mh_kernel, num_kv_blocks=nk, g=g),
        grid=(bh // g, nq, nk),
        in_specs=[
            pl.BlockSpec((g, 1, 8, bq), lambda i, j, kk: (i, j, 0, 0)),
            pl.BlockSpec((g, bq, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((g, bk, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((g, bk, d), lambda i, j, kk: (i, kk, 0))],
        out_specs=pl.BlockSpec((g, d, bq), lambda i, j, kk: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((bh, d, sq), q.dtype),
        scratch_shapes=[pltpu.VMEM((g, d, bq), jnp.float32),
                        pltpu.VMEM((g, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=DS),
    )(bound_rows, qe, ke, ve)
    return out.reshape(b, h, d, sq).transpose(0, 1, 3, 2)


def main():
    from scripts.bench_attn_scan import scan_time, xla_attn
    from storygen_tpu.ops.pallas_attention import flash_attention

    shapes = [("attn3_L2", 3, 8, 1024, 3072, 80),
              ("attn1_L2_ref", 6, 8, 1024, 1024, 80),
              ("attn1_L2_main", 3, 8, 1024, 1024, 80),
              ("attn3_L3", 3, 8, 256, 768, 160),
              ("attn1_L1_main", 3, 8, 4096, 4096, 40)]
    rng = jax.random.PRNGKey(0)
    for name, b, h, sq, skv, d in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
        sm = d ** -0.5
        flops = 4 * b * h * sq * skv * d
        ref = xla_attn(q.astype(jnp.float32), k.astype(jnp.float32),
                       v.astype(jnp.float32), sm)
        bq = min(1024, sq)
        bk = min(1024, skv)
        cands = [("bnd(cur)", functools.partial(flash_attention, scale=sm,
                                                variant="bnd"))]
        for g in (2, 4, 8):
            cands.append((f"mh g{g}", functools.partial(
                mh_attention, sm_scale=sm, bq=bq, bk=bk, g=g)))
        for label, fn in cands:
            try:
                out = fn(q, k, v)
                err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
                dt = scan_time(fn, q, k, v)
                print(f"{name:14s} {label:10s} {dt*1e3:7.3f} ms "
                      f"{flops/dt/1e12:6.1f} TF/s maxerr {err:.2e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:14s} {label:10s} FAILED {type(e).__name__}: "
                      f"{str(e)[:70]}", flush=True)


if __name__ == "__main__":
    main()
