"""Where does the time go inside the flash kernel? On-chip ablation.

For the two dominant shapes (attn3_L1 4096x12288 d40, attn1_L1 4096^2),
times kernels that do progressively more work per kv block:
  qk        s_t = K Q^T only (accumulate s_t sum so nothing is DCE'd)
  qk_exp    + exp2(s_t)
  qk_pv     s_t + PV^T dot (no exp; p := s_t)
  full_bnd  the max-free bounded kernel (qk + exp2 + pv)
  full_bnd2 bounded with two interleaved q sub-blocks (manual MXU/VPU
            overlap)
The deltas isolate MXU qk cost, VPU exp cost, MXU pv cost, and scheduling
overlap quality.

Usage: python scripts/bench_attn_ablate.py
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

DS = ("parallel", "parallel", "arbitrary")


def _ablate_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, d,
                   num_kv_blocks, do_exp, do_pv, halves):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k = k_ref[0]
    v = v_ref[0]
    bq = q_ref.shape[2]
    hq = bq // halves
    for h in range(halves):
        q = q_ref[0, :, h * hq:(h + 1) * hq]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (BK, HQ)
        p_t = jnp.exp2(s_t) if do_exp else s_t
        if do_pv:
            acc_ref[:, h * hq:(h + 1) * hq] += jax.lax.dot_general(
                v, p_t.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (D', HQ)
        else:
            acc_ref[:1, h * hq:(h + 1) * hq] += jnp.sum(
                p_t, axis=0, keepdims=True)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        if do_pv:
            o_ref[0] = (acc_ref[:d, :]
                        / jnp.maximum(acc_ref[d:d + 1, :], 1e-30)
                        ).astype(o_ref.dtype)
        else:
            o_ref[0] = jnp.broadcast_to(
                acc_ref[:1, :], o_ref.shape[1:]).astype(o_ref.dtype)


def ablate_attention(q, k, v, *, sm_scale, bq, bk, do_exp, do_pv,
                     halves=1):
    """q as (BH, D, Sq) already transposed+scaled+bounded on host; k/v
    extended with the ones column."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    log2e = 1.4426950408889634
    qf = q.astype(jnp.float32) * (sm_scale * log2e)
    kf = k.astype(jnp.float32)
    kmax = jnp.sqrt((kf * kf).sum(-1)).max(axis=2, keepdims=True)
    bound = jnp.sqrt((qf * qf).sum(-1)) * kmax
    q_ext = jnp.concatenate([qf, -bound[..., None]], -1).astype(q.dtype)
    ones_k = jnp.ones((b, h, skv, 1), k.dtype)
    k_ext = jnp.concatenate([k, ones_k], -1)
    v_ext = jnp.concatenate([v, ones_k], -1)
    # q pre-transposed on host to (BH, D+1, Sq): kernel reads (D+1, BQ)
    qe = q_ext.reshape(b * h, sq, d + 1).transpose(0, 2, 1)
    ke = k_ext.reshape(b * h, skv, d + 1)
    ve = v_ext.reshape(b * h, skv, d + 1)
    nk = skv // bk
    out = pl.pallas_call(
        functools.partial(_ablate_kernel, d=d, num_kv_blocks=nk,
                          do_exp=do_exp, do_pv=do_pv, halves=halves),
        grid=(b * h, sq // bq, nk),
        in_specs=[
            pl.BlockSpec((1, d + 1, bq), lambda i, j, kk: (i, 0, j)),
            pl.BlockSpec((1, bk, d + 1), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, bk, d + 1), lambda i, j, kk: (i, kk, 0))],
        out_specs=pl.BlockSpec((1, d, bq), lambda i, j, kk: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
        scratch_shapes=[pltpu.VMEM((d + 1, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=DS),
    )(qe, ke, ve)
    return out.reshape(b, h, d, sq).transpose(0, 1, 3, 2)


def xla_attn(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def scan_time(attn_fn, q, k, v, n=20):
    qs = jnp.stack([q * (1 + 1e-6 * i) for i in range(n)])

    @jax.jit
    def run(qs, k, v):
        def body(acc, qi):
            out = attn_fn(qi, k, v)
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return acc

    jax.device_get(run(qs, k, v))
    t0 = time.perf_counter()
    jax.device_get(run(qs, k, v))
    return (time.perf_counter() - t0) / n


def main():
    from storygen_tpu.ops.pallas_attention import flash_attention

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
        flops = 4 * b * h * sq * skv * d
        ref = xla_attn(q.astype(jnp.float32), k.astype(jnp.float32),
                       v.astype(jnp.float32), sm)
        cands = [("repo", functools.partial(flash_attention, scale=sm),
                  False)]
        for bq, bk in ((512, 1024), (512, 2048), (1024, 1024),
                       (1024, 2048), (256, 4096)):
            if bq > sq or sq % bq or bk > skv or skv % bk:
                continue
            if bq * bk * 4 > 8 * 2**20:
                continue
            tag = f"bq{bq} bk{bk}"
            cands += [
                (f"qk        {tag}", functools.partial(
                    ablate_attention, sm_scale=sm, bq=bq, bk=bk,
                    do_exp=False, do_pv=False), True),
                (f"qk_exp    {tag}", functools.partial(
                    ablate_attention, sm_scale=sm, bq=bq, bk=bk,
                    do_exp=True, do_pv=False), True),
                (f"qk_pv     {tag}", functools.partial(
                    ablate_attention, sm_scale=sm, bq=bq, bk=bk,
                    do_exp=False, do_pv=True), True),
                (f"full_bnd  {tag}", functools.partial(
                    ablate_attention, sm_scale=sm, bq=bq, bk=bk,
                    do_exp=True, do_pv=True), False),
                (f"full_bnd2 {tag}", functools.partial(
                    ablate_attention, sm_scale=sm, bq=bq, bk=bk,
                    do_exp=True, do_pv=True, halves=2), False),
            ]
        for label, fn, skip_err in cands:
            try:
                if not skip_err:
                    out = fn(q, k, v)
                    err = jnp.abs(out.astype(jnp.float32) - ref).max()
                    errs = f"maxerr {err:.2e}"
                else:
                    errs = ""
                dt = scan_time(fn, q, k, v)
                print(f"{name:13s} {label:22s} {dt*1e3:7.3f} ms "
                      f"{flops/dt/1e12:6.1f} TF/s  {errs}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:13s} {label:22s} FAILED "
                      f"{type(e).__name__}: {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
