"""Fused GN-affine+SiLU -> conv -> (+temb bias, +residual) vs the same
chain as separate XLA ops around the bare halo kernel.

Quantifies the round-4 prologue/epilogue fusion (ops/pallas_conv.py::
gnconvres3x3) at the dispatch-eligible resnet conv sites: the unfused
chain materializes silu(x*a+s) in HBM (one extra write+read of the
input-sized tensor) and round-trips the conv output for the skip add;
the fused kernel applies the affine+SiLU on the VMEM halo slab and
streams the residual through the BlockSpec pipeline.

Matches the hot path of diffusers ResnetBlock2D conv2 (GN2 -> SiLU ->
conv2 -> +skip, /root/reference/model/unet_2d_blocks.py:5 via
diffusers resnet.py). Run on the real chip:
  python scripts/studies/bench_fused_conv.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.bench_conv import bench
from storygen_tpu.ops.pallas_conv import (gnconvres3x3, halo_conv,
                                          pick_block_h)

# (name, b, h, cin, cout) — the SConv fused-dispatch-eligible stride-1
# resnet conv2 sites (L1 UNet at sampler batches 3/6/9; VAE decoder at
# batch 1). Deep L2-L4 sites stay on shift-GEMM (measured faster there).
SITES = [
    ("L1 res conv2 320->320 b9", 9, 64, 320, 320),
    ("L1 res conv2 320->320 b6", 6, 64, 320, 320),
    ("L1 res conv2 320->320 b3", 3, 64, 320, 320),
    ("L1 res conv2 320->320 b4", 4, 64, 320, 320),   # train micro-batch
    ("VAE dec 512x512 128->128 b1", 1, 512, 128, 128),
    ("VAE dec 256x256 256->256 b1", 1, 256, 256, 256),
]


def main():
    print(f"devices: {jax.devices()}")
    hdr = (f"{'site':30} {'bh':>3} {'unfused ms':>10} {'fused ms':>9} "
           f"{'speedup':>8}")
    print(hdr)
    print("-" * len(hdr))
    for name, b, h, cin, cout in SITES:
        bh_f = pick_block_h(h, h, cin, cout, residual=True, fused=True)
        bh_u = pick_block_h(h, h, cin, cout)
        if bh_f is None or bh_u is None:
            print(f"{name:30}   - (no slab fits VMEM)")
            continue
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (b, h, h, cin), jnp.bfloat16)
        res = jax.random.normal(jax.random.fold_in(k, 1),
                                (b, h, h, cout), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(k, 2),
                              (3, 3, cin, cout), jnp.bfloat16) * 0.02
        a = jnp.full((b, cin), 1.1, jnp.float32)
        s = jnp.full((b, cin), -0.05, jnp.float32)
        bias = jnp.full((b, cout), 0.01, jnp.bfloat16)  # temb-folded

        def unfused(xt, w):
            x, res = xt
            act = (jax.nn.silu(x.astype(jnp.float32)
                               * a[:, None, None, :] + s[:, None, None, :])
                   .astype(x.dtype))
            y = halo_conv(act, w, bias, block_h=bh_u)
            return y + res

        def fused(xt, w):
            x, res = xt
            return gnconvres3x3(x, a, s, w, bias, res, block_h=bh_f)

        t_u = bench(unfused, (x, res), w, iters=300)
        t_f = bench(fused, (x, res), w, iters=300)
        print(f"{name:30} {bh_f:>3} {t_u*1e3:>10.3f} {t_f*1e3:>9.3f} "
              f"{t_u/t_f:>7.2f}x")


if __name__ == "__main__":
    main()
