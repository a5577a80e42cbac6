"""Per-site conv roofline: measured time vs the TRUE bound per site.

BENCH.md's conv bucket row cites "150-190 TF/s vs the 197 TF/s bf16
peak" (76-96%). The naive MXU peak is the wrong bound for the low end:
the shift-GEMM formulation (ops/shift_conv.py) re-reads the input once
per tap, so wide-spatial/narrow-channel sites (L1, 64x64x320) are
partially HBM-bound. This script computes, per UNet site and for the
formulation SConv actually dispatches:

  t_mxu  = FLOPs / 197 TF/s            (bf16 systolic peak, depth>=128)
  t_hbm  = min-bytes / 819 GB/s        (v5e-1 HBM BW)
           min-bytes = taps*in_read + w + out_write   (shift9)
                       patches_write+read + w + out   (im2col)
  bound  = max(t_mxu, t_hbm)
  pct    = bound / measured            (>=0.8 == "at the roofline")

and prints a table to drop into BENCH.md. Uses the elision-proof
chained-fori timing from scripts/bench_conv.py.

Run on the real chip: python scripts/roofline_conv.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.bench_conv import SITES, bench
from storygen_tpu.ops.pallas_conv import halo_conv, halo_downconv
from storygen_tpu.ops.shift_conv import (down_halo_block_h, halo_block_h,
                                         im2col_conv, shift_conv)

PEAK_BF16 = 197e12   # v5e MXU bf16
HBM_BW = 819e9       # v5e HBM


def site_model(b, h, cin, cout, stride, formulation):
    """(flops, min_bytes) for one 3x3 site.

    flops charges what the formulation actually feeds the MXU: the halo
    kernels pad Cin to a lane multiple (320->384 etc.), and those zero
    lanes occupy real systolic cycles, so the halo bound uses the padded
    depth — an honest ceiling, not a utopian one."""
    ho = wo = h // stride
    m = b * ho * wo
    cinp = cin + (-cin) % 128
    flops = 2.0 * m * 9 * cin * cout
    in_bytes = b * h * h * cin * 2          # bf16 activations
    w_bytes = 9 * cin * cout * 2
    out_bytes = m * cout * 2
    if formulation == "shift9":
        # nine dots, each reading a full shifted view of the input; the
        # partial-sum adds fuse into dot epilogues (optimistic: no
        # accumulator HBM round-trips — that's what makes this a BOUND)
        bytes_ = 9 * in_bytes + w_bytes + out_bytes
    elif formulation == "halo":
        # one DMA'd slab read; partial sums live in VMEM
        flops = 2.0 * m * 9 * cinp * cout
        bytes_ = in_bytes + w_bytes + out_bytes
    elif formulation == "halo_dn":
        # phase split: read x, write phases, read phases in-kernel
        flops = 2.0 * m * 9 * cinp * cout
        bytes_ = 3 * in_bytes + w_bytes + out_bytes
    elif formulation == "native":
        # XLA implicit-GEMM conv: one input read, no materialized patches
        bytes_ = in_bytes + w_bytes + out_bytes
    elif formulation == "phase":
        # parity-phase decomposition (shift_conv.py::phase_conv): one
        # relayout pass (read x + write the 4 quarter-phase images), then
        # each of the 9 tap GEMMs reads one quarter-size phase window
        bytes_ = (2 * in_bytes + 9 * (in_bytes // 4)
                  + w_bytes + out_bytes)
    else:  # im2col: patches materialized once (write + read) then 1 GEMM
        patch_bytes = m * 9 * cin * 2
        bytes_ = in_bytes + 2 * patch_bytes + w_bytes + out_bytes
    return flops, bytes_


def pick_formulation(b, h, cin, cout, stride):
    """The formulation SConv actually dispatches for this site."""
    if stride > 1:
        dn = down_halo_block_h((b, h, h, cin), (3, 3), (2, 2),
                               ((1, 1), (1, 1)), cout, 2)
        if dn is not None:
            return "halo_dn", (lambda x, w: halo_downconv(
                x, w, padding=((1, 1), (1, 1)), block_h=dn[0]))
        # the retuned 3x3-s2 dispatch (shift_conv.py, r5 study): native
        # XLA conv for wide/batched sites, phase decomposition for the
        # deep narrow-spatial band
        if cin >= 512 and b * h * h * cin <= 10 * 2 ** 20:
            from storygen_tpu.ops.shift_conv import phase_conv
            return "phase", (lambda x, w: phase_conv(
                x, w, padding=((1, 1), (1, 1))))
        return "native", (lambda x, w: jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    bh = halo_block_h((b, h, h, cin), (3, 3), "SAME", cout, 2)
    if bh is not None:
        return "halo", (lambda x, w: halo_conv(x, w, block_h=bh))
    return "shift9", (lambda x, w: shift_conv(x, w))


def main():
    print(f"devices: {jax.devices()}")
    rows = []
    for (name, h, cin, cout, stride) in SITES:
        for b in (9,):  # ref(6)+main(3) rows — the sampler operating point
            formulation, op = pick_formulation(b, h, cin, cout, stride)
            x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin),
                                  jnp.bfloat16)
            w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                                  jnp.bfloat16) * 0.02
            t = bench(op, x, w, iters=300)
            flops, bytes_ = site_model(b, h, cin, cout, stride, formulation)
            t_mxu, t_hbm = flops / PEAK_BF16, bytes_ / HBM_BW
            bound = max(t_mxu, t_hbm)
            rows.append((name, b, formulation, t * 1e3, flops / t / 1e12,
                         t_mxu * 1e3, t_hbm * 1e3, bound / t,
                         "HBM" if t_hbm > t_mxu else "MXU"))
    hdr = (f"{'site':28} {'b':>2} {'form':>7} {'ms':>7} {'TF/s':>6} "
           f"{'t_mxu':>7} {'t_hbm':>7} {'%bound':>7} bound")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r[0]:28} {r[1]:>2} {r[2]:>7} {r[3]:7.3f} {r[4]:6.1f} "
              f"{r[5]:7.3f} {r[6]:7.3f} {100*r[7]:6.1f}% {r[8]}")


if __name__ == "__main__":
    main()
