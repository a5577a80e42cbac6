"""Clean on-device kernel timing: N applications inside ONE jitted
lax.scan (amortizes the axon tunnel's per-execute RPC overhead, which
pollutes per-call timings by 1-3 ms). Compares current repo flash, the
ds+scale variant at candidate blocks, and XLA einsum attention."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ITER = 20


def scan_time(attn_fn, q, k, v, n=N_ITER):
    """Average per-application device time of attn_fn(q,k,v) over n
    serialized applications in one jit."""
    qs = jnp.stack([q * (1 + 1e-6 * i) for i in range(n)])

    @jax.jit
    def run(qs, k, v):
        def body(acc, qi):
            out = attn_fn(qi, k, v)
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return acc

    jax.device_get(run(qs, k, v))  # compile+warm
    t0 = time.perf_counter()
    jax.device_get(run(qs, k, v))
    dt_n = time.perf_counter() - t0
    return dt_n / n


def xla_attn(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    from scripts.bench_attn_variants import variant_attention
    from storygen_tpu.ops.pallas_attention import flash_attention

    shapes = [
        ("attn3_L1", 3, 8, 4096, 12288, 40),
        ("attn1_L1_ref", 6, 8, 4096, 4096, 40),
        ("attn1_L1_main", 3, 8, 4096, 4096, 40),
        ("attn3_L2", 3, 8, 1024, 3072, 80),
        ("attn1_L2_ref", 6, 8, 1024, 1024, 80),
        ("attn3_L3", 3, 8, 256, 768, 160),
        ("attn2_L1", 3, 8, 4096, 77, 40),
    ]
    rng = jax.random.PRNGKey(0)
    for name, b, h, sq, skv, d in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
        sm = d ** -0.5
        flops = 4 * b * h * sq * skv * d
        cands = [("xla", functools.partial(xla_attn, scale=sm)),
                 ("repo", functools.partial(flash_attention, scale=sm))]
        for bq in (512, 1024):
            for bk in (1024, 2048):
                if bq > sq or sq % bq or bk > skv or skv % bk:
                    continue
                cands.append((f"ds+scale bq{bq} bk{bk}", functools.partial(
                    variant_attention, sm_scale=sm, bq=bq, bk=bk,
                    fold_scale=True, use_exp2=False, split2=False,
                    use_ds=True)))
        for label, fn in cands:
            try:
                dt = scan_time(fn, q, k, v)
                print(f"{name:14s} {label:22s} {dt*1e3:7.3f} ms "
                      f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:14s} {label:22s} FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__" and not (len(sys.argv) > 1
                                    and sys.argv[1] == "bounded"):
    main()
    sys.exit(0)


# ---------------------------------------------------------- bounded softmax
# Max-free flash: shift logits by the a-priori row bound
# b_i = scale*|q_i|*max_j|k_j| (>= true row max by Cauchy-Schwarz), folded
# into the QK matmul via q_ext=[q*scale, -b], k_ext=[k, 1]. Row sums ride
# the MXU via v_ext=[v, 1]. Exact softmax after the final division.
import functools as _ft

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bounded_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, d,
                    num_kv_blocks):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(s)
    acc_ref[:] += jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        o_ref[0] = (acc_ref[:, :d]
                    / jnp.maximum(acc_ref[:, d:d + 1], 1e-20)
                    ).astype(o_ref.dtype)


def bounded_attention(q, k, v, *, sm_scale, bq, bk):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf = (q.astype(jnp.float32) * sm_scale)
    kf = k.astype(jnp.float32)
    kmax = jnp.sqrt((kf * kf).sum(-1)).max(axis=2, keepdims=True)  # (b,h,1)
    bound = jnp.sqrt((qf * qf).sum(-1)) * kmax                      # (b,h,sq)
    q_ext = jnp.concatenate([qf, -bound[..., None]], -1).astype(q.dtype)
    ones = jnp.ones((b, h, skv, 1), k.dtype)
    k_ext = jnp.concatenate([k, ones], -1)
    v_ext = jnp.concatenate([v, ones], -1)
    qe = q_ext.reshape(b * h, sq, d + 1)
    ke = k_ext.reshape(b * h, skv, d + 1)
    ve = v_ext.reshape(b * h, skv, d + 1)
    nk = skv // bk
    out = pl.pallas_call(
        _ft.partial(_bounded_kernel, d=d, num_kv_blocks=nk),
        grid=(b * h, sq // bq, nk),
        in_specs=[pl.BlockSpec((1, bq, d + 1), lambda i, j, kk: (i, j, 0)),
                  pl.BlockSpec((1, bk, d + 1), lambda i, j, kk: (i, kk, 0)),
                  pl.BlockSpec((1, bk, d + 1), lambda i, j, kk: (i, kk, 0))],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d + 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qe, ke, ve)
    return out.reshape(b, h, sq, d)


def main_bounded():
    shapes = [
        ("attn3_L1", 3, 8, 4096, 12288, 40),
        ("attn1_L1_ref", 6, 8, 4096, 4096, 40),
        ("attn1_L1_main", 3, 8, 4096, 4096, 40),
        ("attn3_L2", 3, 8, 1024, 3072, 80),
        ("attn1_L2_ref", 6, 8, 1024, 1024, 80),
    ]
    rng = jax.random.PRNGKey(0)
    for name, b, h, sq, skv, d in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
        sm = d ** -0.5
        flops = 4 * b * h * sq * skv * d
        want = xla_attn(q, k, v, sm).astype(jnp.float32)
        for bq in (512, 1024):
            for bk in (1024, 2048):
                if bq > sq or sq % bq or bk > skv or skv % bk:
                    continue
                fn = _ft.partial(bounded_attention, sm_scale=sm, bq=bq,
                                 bk=bk)
                try:
                    got = jax.jit(fn)(q, k, v).astype(jnp.float32)
                    err = float(jnp.max(jnp.abs(got - want)))
                    dt = scan_time(fn, q, k, v)
                    print(f"{name:14s} bounded bq{bq} bk{bk} {dt*1e3:7.3f}"
                          f" ms {flops/dt/1e12:6.1f} TFLOP/s err={err:.4f}",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{name:14s} bounded bq{bq} bk{bk} FAILED "
                          f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1:
    if sys.argv[1] == "bounded":
        main_bounded()
    elif sys.argv[1] == "pair":
        main_pair()


def _bounded_multi_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, d,
                          num_kv_blocks, sub):
    """Bounded kernel with `sub` independent kv sub-blocks interleaved in
    one grid step: s_i = dot (MXU) of sub-block i can overlap exp of
    sub-block i-1 (VPU) because there is no online-softmax dependency."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk = k_ref.shape[1] // sub
    q = q_ref[0]
    ss = [jax.lax.dot_general(q, k_ref[0, i * bk:(i + 1) * bk],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
          for i in range(sub)]
    ps = [jnp.exp(s).astype(v_ref.dtype) for s in ss]
    pv = sum(jax.lax.dot_general(ps[i], v_ref[0, i * bk:(i + 1) * bk],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             for i in range(sub))
    acc_ref[:] += pv

    @pl.when(ki == num_kv_blocks - 1)
    def _fin():
        o_ref[0] = (acc_ref[:, :d]
                    / jnp.maximum(acc_ref[:, d:d + 1], 1e-20)
                    ).astype(o_ref.dtype)


def bounded_multi_attention(q, k, v, *, sm_scale, bq, bk, sub):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf = (q.astype(jnp.float32) * sm_scale)
    kf = k.astype(jnp.float32)
    kmax = jnp.sqrt((kf * kf).sum(-1)).max(axis=2, keepdims=True)
    bound = jnp.sqrt((qf * qf).sum(-1)) * kmax
    q_ext = jnp.concatenate([qf, -bound[..., None]], -1).astype(q.dtype)
    ones = jnp.ones((b, h, skv, 1), k.dtype)
    k_ext = jnp.concatenate([k, ones], -1)
    v_ext = jnp.concatenate([v, ones], -1)
    qe = q_ext.reshape(b * h, sq, d + 1)
    ke = k_ext.reshape(b * h, skv, d + 1)
    ve = v_ext.reshape(b * h, skv, d + 1)
    big = bk * sub
    nk = skv // big
    out = pl.pallas_call(
        _ft.partial(_bounded_multi_kernel, d=d, num_kv_blocks=nk, sub=sub),
        grid=(b * h, sq // bq, nk),
        in_specs=[pl.BlockSpec((1, bq, d + 1), lambda i, j, kk: (i, j, 0)),
                  pl.BlockSpec((1, big, d + 1), lambda i, j, kk: (i, kk, 0)),
                  pl.BlockSpec((1, big, d + 1), lambda i, j, kk: (i, kk, 0))],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d + 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qe, ke, ve)
    return out.reshape(b, h, sq, d)


def main_pair():
    shapes = [
        ("attn3_L1", 3, 8, 4096, 12288, 40),
        ("attn1_L1_ref", 6, 8, 4096, 4096, 40),
        ("attn1_L1_main", 3, 8, 4096, 4096, 40),
        ("attn3_L2", 3, 8, 1024, 3072, 80),
        ("attn1_L2_ref", 6, 8, 1024, 1024, 80),
    ]
    rng = jax.random.PRNGKey(0)
    for name, b, h, sq, skv, d in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
        sm = d ** -0.5
        flops = 4 * b * h * sq * skv * d
        want = xla_attn(q, k, v, sm).astype(jnp.float32)
        for bq, bk, sub in ((512, 512, 2), (512, 512, 4), (512, 1024, 2),
                            (1024, 512, 2), (1024, 512, 4),
                            (1024, 1024, 2), (256, 512, 2)):
            if bq > sq or sq % bq or bk * sub > skv or skv % (bk * sub):
                continue
            fn = _ft.partial(bounded_multi_attention, sm_scale=sm, bq=bq,
                             bk=bk, sub=sub)
            try:
                got = jax.jit(fn)(q, k, v).astype(jnp.float32)
                err = float(jnp.max(jnp.abs(got - want)))
                dt = scan_time(fn, q, k, v)
                print(f"{name:14s} sub{sub} bq{bq} bk{bk} {dt*1e3:7.3f}"
                      f" ms {flops/dt/1e12:6.1f} TFLOP/s err={err:.4f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:14s} sub{sub} bq{bq} bk{bk} FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
