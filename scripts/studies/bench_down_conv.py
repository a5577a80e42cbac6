"""Strided (3x3/s2) conv formulations at the UNet/VAE downsample sites.

Decides SConv's strided dispatch the same way bench_halo_conv.py decided
the stride-1 dispatch: measure im2col (current winner, but only 29% of
bound at the 64x64 site per scripts/roofline_conv.py), strided
shift-GEMM, and the phase-split halo_downconv kernel on the real chip.

Run:  python scripts/bench_down_conv.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.bench_conv import bench
from storygen_tpu.ops.pallas_conv import halo_downconv, pick_down_block_h
from storygen_tpu.ops.shift_conv import im2col_conv, shift_conv

# (name, batch, h, cin, cout, padding) — UNet Downsample2D uses the
# symmetric torch pad=1; the VAE encoder downsamples use the reference's
# asymmetric (0,1) pad. Sampler conv batches are 6/3 (ref/main pass);
# 9 is the roofline proxy; VAE encode runs at image res, batch 1.
SYM = ((1, 1), (1, 1))
ASYM = ((0, 1), (0, 1))
SITES = [
    ("L1 down 320 s2", 9, 64, 320, 320, SYM),
    ("L2 down 640 s2", 9, 32, 640, 640, SYM),
    ("L3 down 1280 s2", 9, 16, 1280, 1280, SYM),
    ("VAE enc 512px 128 s2", 1, 512, 128, 128, ASYM),
    ("VAE enc 256px 256 s2", 1, 256, 256, 256, ASYM),
    ("VAE enc 128px 512 s2", 1, 128, 512, 512, ASYM),
]


def main():
    print(f"devices: {jax.devices()}")
    hdr = (f"{'site':24} {'b':>2} {'bho':>3} {'im2col':>8} {'shift':>8} "
           f"{'halo':>8} {'haloTF/s':>8} {'vs im2col':>9}")
    print(hdr)
    print("-" * len(hdr))
    for (name, b, h, cin, cout, pad) in SITES:
        ho = (h + pad[0][0] + pad[0][1] - 3) // 2 + 1
        wo = (h + pad[1][0] + pad[1][1] - 3) // 2 + 1
        bho = pick_down_block_h(ho, wo, cin, cout)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                              jnp.bfloat16) * 0.02
        t_i = bench(lambda x, w: im2col_conv(x, w, stride=2, padding=pad),
                    x, w, iters=300)
        t_s = bench(lambda x, w: shift_conv(x, w, stride=2, padding=pad),
                    x, w, iters=300)
        from storygen_tpu.ops.shift_conv import HALO_DOWN_ENABLED
        if not HALO_DOWN_ENABLED:
            print(f"{name:24} {b:>2}   - {t_i*1e3:8.3f} {t_s*1e3:8.3f} "
                  f"{'(halo quarantined)':>8}")
            continue
        if bho is None:
            print(f"{name:24} {b:>2}   - {t_i*1e3:8.3f} {t_s*1e3:8.3f} "
                  f"{'(no slab fits VMEM)':>8}")
            continue
        # static_n: halo_downconv faults under dynamic-trip loops (see
        # ops/pallas_conv.py known chip limit)
        t_h = bench(lambda x, w: halo_downconv(x, w, padding=pad,
                                               block_h=bho),
                    x, w, iters=300, static_n=True)
        flops = 2.0 * b * ho * wo * 9 * cin * cout
        print(f"{name:24} {b:>2} {bho:>3} {t_i*1e3:8.3f} {t_s*1e3:8.3f} "
              f"{t_h*1e3:8.3f} {flops/t_h/1e12:8.1f} {t_i/t_h:8.2f}x")


if __name__ == "__main__":
    main()
