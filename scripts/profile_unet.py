"""Microbenchmark the UNet forward on TPU: param dtype, batch, cycles."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from storygen_tpu.configs import UNetConfig
from storygen_tpu.models.unet import UNet2DConditionModel, context_shapes


def bench(fn, *args, iters=5):
    # NOTE: through the axon tunnel block_until_ready() under-reports;
    # device_get on a reduced scalar is the reliable sync (see
    # .claude/skills/verify/SKILL.md)
    import jax
    jax.device_get(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = jax.random.PRNGKey(0)
    cfg = UNetConfig()
    model = UNet2DConditionModel(config=cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(rng, jnp.zeros((1, 16, 16, 4)),
                                 jnp.asarray([0]), jnp.zeros((1, 77, 768)))
    params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    hw = 64
    for b, label in ((3, "main-pass b3"), (9, "ref-pass b9")):
        sample = jnp.zeros((b, hw, hw, 4), jnp.bfloat16)
        t = jnp.zeros((b,), jnp.int32)
        text = jnp.zeros((b, 77, 768), jnp.bfloat16)
        ctx = {k: jnp.zeros((b,) + s[1:], jnp.bfloat16)
               for k, s in context_shapes(1, hw, num_refs=3).items()}

        @jax.jit
        def ref_cycle(p, sample, t, text):
            return model.apply(p, sample, t, text)

        @jax.jit
        def img_cycle(p, sample, t, text, ctx):
            return model.apply(p, sample, t, text, ctx)

        dt32 = bench(ref_cycle, params, sample, t, text)
        dt16 = bench(ref_cycle, params_bf16, sample, t, text)
        print(f"{label} ref-cycle: fp32-params {dt32*1e3:.1f} ms, "
              f"bf16-params {dt16*1e3:.1f} ms")
        if b == 3:
            dt32i = bench(img_cycle, params, sample, t, text, ctx)
            dt16i = bench(img_cycle, params_bf16, sample, t, text, ctx)
            print(f"{label} img-cycle(3ref): fp32-params {dt32i*1e3:.1f} ms, "
                  f"bf16-params {dt16i*1e3:.1f} ms")


if __name__ == "__main__":
    main()
