"""On-device flash-attention numerics: Mosaic-compiled kernels vs XLA.

Runs on the real TPU (no interpret mode): forward + backward, masked +
unmasked, all three forward variants, at a reduced attn3-shaped problem.
Prints one JSON line with max abs errors; exits nonzero on tolerance
breach. Used by tests/test_tpu_kernels.py (subprocess) and quoted in
BENCH.md.

Tolerances: inputs are bf16 (the serving/training dtype), reference is
the fp32 XLA path on the same chip; bf16 rounding of q/k/v dominates the
error budget (~1e-2 on O(1) outputs).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TOL_FWD = 2e-2
TOL_BWD = 5e-2


def main():
    from storygen_tpu.ops.attention import xla_attention
    from storygen_tpu.ops.pallas_attention import flash_attention

    try:
        backend = jax.default_backend()
    except Exception as e:  # tunnel down: backend init raises UNAVAILABLE
        print(json.dumps({"ok": False,
                          "reason": f"no TPU (init failed: {e})"[:300]}))
        return 2
    if backend not in ("tpu", "axon"):
        print(json.dumps({"ok": False, "reason": f"no TPU ({backend})"}))
        return 2

    rng = jax.random.PRNGKey(0)
    b, h, sq, skv, d = 2, 4, 1024, 3072, 40
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, skv, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, skv, d), jnp.bfloat16)
    g = jax.random.normal(ks[3], (b, h, sq, d), jnp.bfloat16)
    scale = d ** -0.5
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    bm = jnp.tile(jnp.asarray([[1.0, 1.0, 0.0]]), (b, 1))  # drop ref 3
    elem_mask = jnp.repeat(bm.astype(bool), skv // 3,
                           axis=1)[:, None, None, :]

    ref = jax.jit(lambda q, k, v: xla_attention(q, k, v, scale))(qf, kf, vf)
    ref_m = jax.jit(lambda q, k, v: xla_attention(
        q, k, v, scale, mask=elem_mask))(qf, kf, vf)

    def vjp_of(fn):
        def loss(q, k, v):
            return (fn(q, k, v).astype(jnp.float32)
                    * g.astype(jnp.float32)).sum()
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    gref = vjp_of(lambda q, k, v: xla_attention(q, k, v, scale))(qf, kf, vf)

    results, ok = {}, True
    for variant in ("grid", "online_t", "bnd"):
        fwd = jax.jit(lambda q, k, v, _v=variant: flash_attention(
            q, k, v, scale=scale, variant=_v))
        out = fwd(q, k, v)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        results[f"{variant}_fwd"] = err
        ok &= err < TOL_FWD

        fwd_m = jax.jit(lambda q, k, v, _v=variant: flash_attention(
            q, k, v, scale=scale, variant=_v, block_mask=bm))
        err_m = float(jnp.abs(fwd_m(q, k, v).astype(jnp.float32)
                              - ref_m).max())
        results[f"{variant}_fwd_masked"] = err_m
        ok &= err_m < TOL_FWD

        gs = vjp_of(lambda q, k, v, _v=variant: flash_attention(
            q, k, v, scale=scale, variant=_v))(q, k, v)
        for name, a, r in zip(("dq", "dk", "dv"), gs, gref):
            e = float(jnp.abs(a.astype(jnp.float32) - r).max()
                      / (jnp.abs(r).max() + 1e-6))
            results[f"{variant}_{name}_relerr"] = e
            ok &= e < TOL_BWD

    # out_layout="bhds" (the head-merge-fold path CrossAttention uses)
    fwd_t = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, scale=scale, out_layout="bhds"))
    err_t = float(jnp.abs(
        fwd_t(q, k, v).transpose(0, 1, 3, 2).astype(jnp.float32)
        - ref).max())
    results["bhds_fwd"] = err_t
    ok &= err_t < TOL_FWD

    # fused GEGLU + output-projection GEMM kernel
    from storygen_tpu.ops.pallas_geglu import geglu_matmul
    m, n, e = 1024, 1280, 320
    kg = jax.random.split(rng, 3)
    proj = jax.random.normal(kg[0], (m, 2 * n), jnp.bfloat16)
    w2 = (jax.random.normal(kg[1], (n, e), jnp.bfloat16) * 0.03)
    bias2 = jax.random.normal(kg[2], (e,), jnp.bfloat16)

    def geglu_ref(proj, w2, bias2):
        pf = proj.astype(jnp.float32)
        value, gate = pf[:, :n], pf[:, n:]
        gated = value * jax.nn.gelu(gate, approximate=False)
        return gated @ w2.astype(jnp.float32) + bias2.astype(jnp.float32)

    got = jax.jit(geglu_matmul)(proj, w2, bias2).astype(jnp.float32)
    want = jax.jit(geglu_ref)(proj, w2, bias2)
    ge = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-6))
    results["geglu_relerr"] = ge
    ok &= ge < TOL_FWD

    # VMEM halo conv kernel (UNet L1-site shape, reduced batch)
    from storygen_tpu.ops.pallas_conv import conv3x3
    from storygen_tpu.ops.shift_conv import shift_conv
    kc = jax.random.split(rng, 4)
    xc = jax.random.normal(kc[0], (2, 64, 64, 320), jnp.bfloat16)
    wc = jax.random.normal(kc[1], (3, 3, 320, 320), jnp.bfloat16) * 0.03
    bc = jax.random.normal(kc[2], (320,), jnp.bfloat16) * 0.1
    got_c = jax.jit(lambda x, w, b: conv3x3(x, w, b, 32))(
        xc, wc, bc).astype(jnp.float32)
    want_c = jax.jit(shift_conv)(
        xc.astype(jnp.float32), wc.astype(jnp.float32),
        bc.astype(jnp.float32))
    ce = float(jnp.abs(got_c - want_c).max()
               / (jnp.abs(want_c).max() + 1e-6))
    results["halo_conv_relerr"] = ce
    ok &= ce < TOL_FWD

    # halo conv backward: dL/dx routes through halo_conv(g, k_flip) at
    # this halo-eligible shape (fp32 grads, as in training)
    xg = xc.astype(jnp.float32)
    wg = wc.astype(jnp.float32)
    bg = bc.astype(jnp.float32)
    cot = jax.random.normal(kc[3], xg.shape, jnp.float32)

    def _loss(fn):
        return jax.grad(lambda *a: (fn(*a) * cot).sum(), argnums=(0, 1, 2))

    gx, gw, gb2 = jax.jit(_loss(lambda x, w, b: conv3x3(x, w, b, 32)))(
        xg, wg, bg)
    rx, rw, rb2 = jax.jit(_loss(shift_conv))(xg, wg, bg)
    cbe = max(
        float(jnp.abs(gx - rx).max() / (jnp.abs(rx).max() + 1e-6)),
        float(jnp.abs(gw - rw).max() / (jnp.abs(rw).max() + 1e-6)),
        float(jnp.abs(gb2 - rb2).max() / (jnp.abs(rb2).max() + 1e-6)))
    results["halo_conv_bwd_relerr"] = cbe
    ok &= cbe < TOL_FWD

    # fused GN-affine+SiLU prologue + per-batch bias (resnet operating
    # point: gnconv3x3 == silu(x*a+s) -> conv -> +bias_b), fwd + bwd
    from storygen_tpu.ops.pallas_conv import gnconv3x3
    kf = jax.random.split(jax.random.PRNGKey(11), 3)
    af = jnp.abs(jax.random.normal(kf[0], (2, 320), jnp.float32)) + 0.5
    sf = jax.random.normal(kf[1], (2, 320), jnp.float32) * 0.3
    b2f = jax.random.normal(kf[2], (2, 320), jnp.float32) * 0.1

    def gn_ref(x, a, s, w, bb):
        z = (x.astype(jnp.float32) * a[:, None, None, :]
             + s[:, None, None, :])
        return (shift_conv((z * jax.nn.sigmoid(z)).astype(x.dtype), w)
                .astype(jnp.float32) + bb[:, None, None, :])

    got_f = jax.jit(lambda x, a, s, w, bb: gnconv3x3(
        x, a, s, w, bb.astype(x.dtype), 32))(
            xc, af, sf, wc, b2f).astype(jnp.float32)
    want_f = jax.jit(gn_ref)(xc, af, sf, wc, b2f)
    fe = float(jnp.abs(got_f - want_f).max()
               / (jnp.abs(want_f).max() + 1e-6))
    results["gnconv_relerr"] = fe
    ok &= fe < TOL_FWD

    def _loss5(fn):
        return jax.grad(lambda *a: (fn(*a) * cot).sum(),
                        argnums=(0, 1, 2, 3, 4))

    gf = jax.jit(_loss5(lambda x, a, s, w, bb: gnconv3x3(
        x, a, s, w, bb, 32)))(xg, af, sf, wg, b2f)
    rf = jax.jit(_loss5(gn_ref))(xg, af, sf, wg, b2f)
    fbe = max(float(jnp.abs(g - r).max() / (jnp.abs(r).max() + 1e-6))
              for g, r in zip(gf, rf))
    results["gnconv_bwd_relerr"] = fbe
    ok &= fbe < TOL_FWD

    # VMEM-ceiling gate (ADVICE r4): VMEM_BUDGET leaves <1 MiB of the
    # ~16 MiB/core for Mosaic's own buffers, calibrated on the current
    # toolchain. Execute the HIGHEST-MODELED eligible site (fused and
    # unfused dispatch) so a toolchain bump that grows Mosaic scratch
    # fails here — loudly, on every gated suite run — instead of as a
    # nondeterministic production OOM.
    from storygen_tpu.ops.pallas_conv import gnconv3x3 as _gn, vmem_need
    from storygen_tpu.ops.shift_conv import halo_block_h
    SITES = [  # (h, w, cin, cout) across the real UNet/VAE dispatch set
        (64, 64, 320, 320), (64, 64, 640, 320), (64, 64, 960, 320),
        (64, 64, 640, 640), (512, 512, 128, 128), (256, 256, 256, 256),
        (256, 256, 128, 256), (512, 512, 256, 128)]
    best = None
    for (h_, w_, ci, co) in SITES:
        for fz in (False, True):
            bh_ = halo_block_h((1, h_, w_, ci), (3, 3), "SAME", co, 2,
                               fused=fz)
            if bh_ is None:
                continue
            nd = vmem_need(bh_, h_, w_, ci, co, 2, fused=fz)
            if best is None or nd > best[0]:
                best = (nd, h_, w_, ci, co, bh_, fz)
    nd, h_, w_, ci, co, bh_, fz = best
    results["vmem_ceiling_mib"] = round(nd / 2 ** 20, 2)
    kv = jax.random.split(jax.random.PRNGKey(13), 3)
    xv = jax.random.normal(kv[0], (1, h_, w_, ci), jnp.bfloat16)
    wv = jax.random.normal(kv[1], (3, 3, ci, co), jnp.bfloat16) * 0.02
    bv = jax.random.normal(kv[2], (co,), jnp.bfloat16) * 0.1
    if fz:
        av = jnp.abs(jax.random.normal(kv[0], (1, ci), jnp.float32)) + 0.5
        sv = jax.random.normal(kv[1], (1, ci), jnp.float32) * 0.2
        got_v = jax.jit(lambda x, a, s, w, b: _gn(
            x, a, s, w, jnp.broadcast_to(b[None], (1, co)), bh_))(
                xv, av, sv, wv, bv).astype(jnp.float32)
        zz = (xv.astype(jnp.float32) * av[:, None, None, :]
              + sv[:, None, None, :])
        want_v = jax.jit(shift_conv)(
            (zz * jax.nn.sigmoid(zz)).astype(jnp.bfloat16)
            .astype(jnp.float32),
            wv.astype(jnp.float32), bv.astype(jnp.float32))
    else:
        got_v = jax.jit(lambda x, w, b: conv3x3(x, w, b, bh_))(
            xv, wv, bv).astype(jnp.float32)
        want_v = jax.jit(shift_conv)(
            xv.astype(jnp.float32), wv.astype(jnp.float32),
            bv.astype(jnp.float32))
    ve = float(jnp.abs(got_v - want_v).max()
               / (jnp.abs(want_v).max() + 1e-6))
    results["vmem_ceiling_relerr"] = ve
    results["vmem_ceiling_site"] = [h_, w_, ci, co, bh_, bool(fz)]
    ok &= ve < TOL_FWD

    # stride-2 phase-split halo kernel, both model padding conventions.
    # QUARANTINED by default: the kernel faults the chip nondeterministically
    # (ops/pallas_conv.py known-fault note) and would kill this gate ~half
    # the time; opt in with STORYGEN_HALO_DOWN=1 to re-evaluate.
    from storygen_tpu.ops.pallas_conv import halo_downconv
    from storygen_tpu.ops.shift_conv import HALO_DOWN_ENABLED
    for tag, pad, (hh, cc) in (
            ("halo_down_sym_relerr", ((1, 1), (1, 1)), (64, 320)),
            ("halo_down_asym_relerr", ((0, 1), (0, 1)), (128, 128))) \
            if HALO_DOWN_ENABLED else ():
        kd = jax.random.split(jax.random.PRNGKey(7), 3)
        xd = jax.random.normal(kd[0], (2, hh, hh, cc), jnp.bfloat16)
        wd = jax.random.normal(kd[1], (3, 3, cc, cc), jnp.bfloat16) * 0.03
        bd = jax.random.normal(kd[2], (cc,), jnp.bfloat16) * 0.1
        got_d = jax.jit(lambda x, w, b: halo_downconv(
            x, w, b, padding=pad))(xd, wd, bd).astype(jnp.float32)
        want_d = jax.lax.conv_general_dilated(
            xd.astype(jnp.float32), wd.astype(jnp.float32), (2, 2), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bd.astype(jnp.float32)
        de = float(jnp.abs(got_d - want_d).max()
                   / (jnp.abs(want_d).max() + 1e-6))
        results[tag] = de
        ok &= de < TOL_FWD

    print(json.dumps({"ok": bool(ok), "backend": backend,
                      "shape": [b, h, sq, skv, d], **results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
