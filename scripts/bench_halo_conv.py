"""Halo kernel vs shift-GEMM at the UNet's stride-1 conv sites.

Decides the SConv dispatch: the Pallas halo kernel (ops/pallas_conv.py)
reads the input ONCE per slab instead of shift-GEMM's 9 tap-reads, which
the per-site roofline (scripts/roofline_conv.py) shows is the L1 sites'
missing 33-59%. Run on the real chip:  python scripts/bench_halo_conv.py
"""
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

from scripts.bench_conv import SITES, bench
from storygen_tpu.ops.pallas_conv import halo_conv, pick_block_h
from storygen_tpu.ops.shift_conv import shift_conv

PEAK_BF16 = 197e12


def main():
    print(f"devices: {jax.devices()}")
    hdr = (f"{'site':28} {'b':>2} {'bh':>3} {'shift ms':>9} {'halo ms':>8} "
           f"{'halo TF/s':>9} {'speedup':>8}")
    print(hdr)
    print("-" * len(hdr))
    # VAE decoder sites run at image resolution with narrow channels and
    # batch 1; the SConv dispatch rule (h*w >= 64*64) routes them to the
    # halo kernel too, so they must be measured, not assumed.
    extra = [("VAE dec 512x512 128->128", 1, 512, 128, 128, 1),
             ("VAE dec 256x256 256->256", 1, 256, 256, 256, 1),
             ("VAE dec 128x128 512->512", 1, 128, 512, 512, 1)]
    # The sampler's actual conv batches are 6 (batched 2-CFG x 3-ref
    # pass) and 3 (main 3-row CFG pass); 9 is the roofline table's
    # combined proxy. The training step runs batch 4.
    batches = (3, 6, 9) if os.environ.get("HALO_BATCH_SWEEP") else (9,)
    for (name, b, h, cin, cout, stride) in (
            [(n, bb, h, ci, co, s) for (n, h, ci, co, s) in SITES
             for bb in batches] + extra):
        if stride != 1:
            continue
        bh = pick_block_h(h, h, cin, cout)
        if bh is None:
            print(f"{name:28} {b:>2}   - (no slab fits VMEM)")
            continue
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                              jnp.bfloat16) * 0.02
        t_s = bench(lambda x, w: shift_conv(x, w), x, w, iters=300)
        t_h = bench(lambda x, w: halo_conv(x, w, block_h=bh), x, w,
                    iters=300)
        flops = 2.0 * b * h * h * 9 * cin * cout
        print(f"{name:28} {b:>2} {bh:>3} {t_s*1e3:9.3f} {t_h*1e3:8.3f} "
              f"{flops/t_h/1e12:9.1f} {t_s/t_h:7.2f}x")
        if os.environ.get("HALO_FUSED"):
            # resnet operating point: folded GN affine+SiLU in front of
            # the conv — separate XLA elementwise pass vs the in-kernel
            # prologue (gnconv path of SConv).
            a = jnp.abs(jax.random.normal(
                jax.random.PRNGKey(2), (b, cin), jnp.float32)) + 0.5
            sft = jax.random.normal(
                jax.random.PRNGKey(3), (b, cin), jnp.float32) * 0.3

            def unfused(x, w):
                z = (x.astype(jnp.float32) * a[:, None, None, :]
                     + sft[:, None, None, :])
                return halo_conv((z * jax.nn.sigmoid(z)).astype(x.dtype),
                                 w, block_h=bh)

            t_u = bench(unfused, x, w, iters=300)
            t_f = bench(lambda x, w: halo_conv(
                x, w, block_h=bh, prologue=(a, sft)), x, w, iters=300)
            print(f"{'  +GN-affine+SiLU':28} {b:>2} {bh:>3} "
                  f"{t_u*1e3:9.3f} {t_f*1e3:8.3f} "
                  f"{flops/t_f/1e12:9.1f} {t_u/t_f:7.2f}x  (fused)")


if __name__ == "__main__":
    main()
