"""Stride-2 3x3 formulation study: space-to-depth vs im2col vs native.

VERDICT r4 #5: the strided sites sit at 29% of bound on im2col (and the
Pallas phase-split kernel is quarantined for a nondeterministic Mosaic
fault). Candidates measured here, all pure XLA and exact:

  - native : lax.conv_general_dilated (XLA implicit GEMM)
  - im2col : patch materialization + one GEMM (current dispatch winner
             below the 64 MB patch cap; larger sites fall to native)
  - phase  : parity-phase decomposition — one relayout pass, then the 9
             tap-GEMMs read CONTIGUOUS windows of quarter-size phase
             images (ops/shift_conv.py::phase_conv)
  - s2d    : space-to-depth channel packing + 4 tap-GEMMs with a
             (2,2,4Cin,Cout) zero-padded kernel: 16/9 the MACs for
             9->4 operand reads (ops/shift_conv.py::s2d_conv)

Sites: UNet Downsample2D (symmetric torch pad=1) at the sampler batch,
VAE encoder downsamples (asymmetric (0,1) pad) at serving batch 1 and
the in-step-training regime (16 images of 512px per micro-step).

Run:  python scripts/studies/bench_s2d_conv.py
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
from storygen_tpu.ops.shift_conv import im2col_conv, phase_conv, s2d_conv

SYM = ((1, 1), (1, 1))
ASYM = ((0, 1), (0, 1))
SITES = [
    ("L1 down 320 s2", 9, 64, 320, 320, SYM),
    ("L2 down 640 s2", 9, 32, 640, 640, SYM),
    ("L3 down 1280 s2", 9, 16, 1280, 1280, SYM),
    ("VAE enc 512px 128 s2", 1, 512, 128, 128, ASYM),
    ("VAE enc 256px 256 s2", 1, 256, 256, 256, ASYM),
    ("VAE enc 128px 512 s2", 1, 128, 512, 512, ASYM),
    ("VAE enc 512px 128 s2 b16", 16, 512, 128, 128, ASYM),
    ("VAE enc 256px 256 s2 b16", 16, 256, 256, 256, ASYM),
    ("VAE enc 128px 512 s2 b16", 16, 128, 512, 512, ASYM),
]


def native(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    print(f"devices: {jax.devices()}")
    hdr = (f"{'site':26} {'b':>2} {'native':>8} {'im2col':>8} "
           f"{'phase':>8} {'s2d':>8} {'best':>7} {'TF/s':>6} "
           f"{'vs disp':>7}")
    print(hdr)
    print("-" * len(hdr))
    for (name, b, h, cin, cout, pad) in SITES:
        ho = (h + pad[0][0] + pad[0][1] - 3) // 2 + 1
        wo = (h + pad[1][0] + pad[1][1] - 3) // 2 + 1
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                              jnp.bfloat16) * 0.02
        iters = 300 if b * h * h * cin < 3e7 else 60
        t_n = bench(lambda x, w: native(x, w, pad), x, w, iters=iters)
        # current dispatch: im2col under the 64 MB patch cap, else native
        cols_bytes = b * ho * wo * 9 * cin * 2
        t_i = bench(lambda x, w: im2col_conv(x, w, stride=2, padding=pad),
                    x, w, iters=iters)
        t_p = bench(lambda x, w: phase_conv(x, w, padding=pad),
                    x, w, iters=iters)
        t_s = bench(lambda x, w: s2d_conv(x, w, padding=pad),
                    x, w, iters=iters)
        t_disp = t_i if cols_bytes <= 64 * 2 ** 20 else t_n
        times = {"native": t_n, "im2col": t_i, "phase": t_p, "s2d": t_s}
        best = min(times, key=times.get)
        flops = 2.0 * b * ho * wo * 9 * cin * cout
        print(f"{name:26} {b:>2} {t_n*1e3:8.3f} {t_i*1e3:8.3f} "
              f"{t_p*1e3:8.3f} {t_s*1e3:8.3f} {best:>7} "
              f"{flops/times[best]/1e12:6.1f} {t_disp/times[best]:6.2f}x")


if __name__ == "__main__":
    main()
