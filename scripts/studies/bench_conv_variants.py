"""Conv formulation shootout per UNet site: XLA native conv vs
9-shift-GEMM vs im2col-GEMM (all exact, bf16 in / fp32 acc semantics of
lax.conv with preferred bf16 out).

Motivation (BENCH.md round-2 profile): convs are the top step bucket
(32.1 ms, 38%) at 108-170 TF/s. If an alternative exact formulation beats
XLA's implicit GEMM at specific sites, Conv2D can dispatch per-shape.

- shift9: y = sum_{dy,dx} shift(x)[dy,dx] @ W[dy,dx] — nine M x C x C
  GEMMs on unshifted layouts; contraction depth C (>= 320) instead of
  9C, but no patch materialization.
- im2col: materialize (M, 9C) patches then one GEMM — maximal
  contraction depth at 9x activation HBM traffic.

Timing methodology: scripts/bench_conv.py (chained fori_loop, marginal
time, elision-proof).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from scripts.bench_conv import SITES, bench


def conv_native(x, w, s):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def conv_shift9(x, w, s):
    b, h, ww, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h:s, dx:dx + ww:s, :]
            y = jax.lax.dot_general(
                xs, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = y if out is None else out + y
    return out.astype(jnp.bfloat16)


def conv_im2col(x, w, s):
    b, h, ww, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + h:s, dx:dx + ww:s, :]
         for dy in range(3) for dx in range(3)], axis=-1)  # (B,Ho,Wo,9C)
    return jax.lax.dot_general(
        cols, w.reshape(9 * cin, cout), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16)


def main():
    print(f"devices: {jax.devices()}")
    peak = 197e12
    for b in (3, 6):
        print(f"\n-- batch {b} --")
        for name, h, cin, cout, s in SITES:
            x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin),
                                  jnp.bfloat16)
            w = jax.random.normal(jax.random.PRNGKey(1),
                                  (3, 3, cin, cout), jnp.bfloat16) * 0.02
            ho = h // s
            fl = 2 * b * ho * ho * 9 * cin * cout
            row = f"{name:26s}"
            for tag, fn in (("native", conv_native),
                            ("shift9", conv_shift9),
                            ("im2col", conv_im2col)):
                dt = bench(lambda x, w, fn=fn, s=s: fn(x, w, s), x, w)
                row += f"  {tag} {dt*1e3:7.3f}ms {fl/dt/1e12:5.1f}TF"
            print(row, flush=True)


if __name__ == "__main__":
    main()
