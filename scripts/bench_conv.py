"""Per-site conv microbench for the SD-1.5 UNet at the sampler operating
point (512px latents, ref pass batch 6 + main pass batch 3).

WARNING: wall-clock timing of sub-millisecond kernels through the axon
serving tunnel is unreliable — the tunnel has a ~30 ms dispatch floor
with tens-of-ms jitter, and elides repeated identical launches. Numbers
here are only meaningful for aggregate times >> the dispatch floor. For
per-site ground truth use the xprof device self-times instead
(scripts/profile_sampler.py dumps /tmp/opstats_loop.tsv); that profile
puts the UNet's convs at 108-170 TF/s (55-86% of v5e bf16 peak), which
is why no custom Pallas conv kernel ships: XLA's implicit-GEMM convs are
already within ~1.3x of the practical ceiling, and Pallas BlockSpecs
cannot express the overlapping halo reads a fused 3x3 conv needs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# (name, H, Cin, Cout, stride) at 512px; spatial W == H.
SITES = [
    ("L1 res conv 320->320", 64, 320, 320, 1),
    ("L1 up conv1 640->320", 64, 640, 320, 1),
    ("L1 up conv1 960->320", 64, 960, 320, 1),
    ("L1 upsampler 640->640", 64, 640, 640, 1),
    ("L1 down 320 s2", 64, 320, 320, 2),
    ("L2 res conv 640->640", 32, 640, 640, 1),
    ("L2 res conv1 320->640", 32, 320, 640, 1),
    ("L2 up conv1 1280->640", 32, 1280, 640, 1),
    ("L2 upsampler 1280->1280", 32, 1280, 1280, 1),
    ("L3 res conv 1280->1280", 16, 1280, 1280, 1),
    ("L3 up conv1 2560->1280", 16, 2560, 1280, 1),
    ("L4 res conv 1280->1280", 8, 1280, 1280, 1),
]


def bench(op, x, w, iters=1000, static_n=False):
    """Marginal per-iteration time of `op(x, w)`.

    The axon tunnel has a ~30 ms dispatch floor per jit call and elides
    repeated identical launches, so: chain iterations through a
    data-dependent weight perturbation inside ONE jitted while-loop
    (dynamic trip count -> one compile), consume the full output each
    iteration (slicing would let XLA DCE the conv down to one column),
    and report (t(iters) - t(1)) / (iters - 1).

    static_n bakes the trip count into the compile (one executable per n,
    slower to build): REQUIRED for ops containing halo_downconv, which
    faults the chip under dynamic-trip-count loops (known limit, see
    ops/pallas_conv.py::halo_downconv) — static-bound fori matches the
    production sampler/training loop shape anyway."""

    import functools

    @functools.partial(jax.jit, static_argnums=(3,) if static_n else ())
    def many(x, w, salt, n):
        def body(i, carry):
            acc, w = carry
            y = op(x, w)
            acc = acc + jnp.sum(y.astype(jnp.float32))
            w = w * (1.0 + acc * 1e-30).astype(w.dtype)
            return (acc, w)
        return jax.lax.fori_loop(0, int(n) if static_n else n, body,
                                 (salt.astype(jnp.float32), w),
                                 unroll=False)[0]

    def timed(salt, n):
        t0 = time.perf_counter()
        # device_get on the reduced scalar: block_until_ready does NOT
        # actually sync through the axon tunnel (verify skill gotchas)
        float(jax.device_get(many(x, w, jnp.float32(salt), n)))
        return time.perf_counter() - t0

    timed(0.0, 2)  # compile + backend warm
    base = min(timed(1e-6, 1), timed(2e-6, 1), timed(3e-6, 1))
    full = min(timed(4e-6, iters), timed(5e-6, iters))
    return (full - base) / (iters - 1)


def main():
    print(f"devices: {jax.devices()}")
    peak = 197e12  # v5e bf16
    for b in (6, 3, 9):
        print(f"\n-- batch {b} --")
        tot_t = tot_f = 0.0
        for name, h, cin, cout, s in SITES:
            x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin),
                                  jnp.bfloat16)
            w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                                  jnp.bfloat16) * 0.02

            @jax.jit
            def conv(x, w, s=s):
                return jax.lax.conv_general_dilated(
                    x, w, (s, s), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)

            dt = bench(conv, x, w)
            ho = h // s
            fl = 2 * b * ho * ho * 9 * cin * cout
            tot_t += dt
            tot_f += fl
            print(f"{name:26s} {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s "
                  f"({100*fl/dt/peak:4.1f}% peak)")
        print(f"{'TOTAL':26s} {tot_t*1e3:7.3f} ms  {tot_f/tot_t/1e12:6.1f} TF/s")

    # matmul reference point: what the MXU gives a plain big GEMM
    for m, kk, n in ((36864, 2880, 320), (9216, 11520, 640),
                     (36864, 320, 320), (8192, 1280, 1280)):
        a = jax.random.normal(jax.random.PRNGKey(0), (m, kk), jnp.bfloat16)
        bmat = jax.random.normal(jax.random.PRNGKey(1), (kk, n), jnp.bfloat16)
        mm = jax.jit(lambda a, b: a @ b)
        dt = bench(mm, a, bmat)
        fl = 2 * m * kk * n
        print(f"matmul {m}x{kk}x{n}: {dt*1e3:7.3f} ms {fl/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
