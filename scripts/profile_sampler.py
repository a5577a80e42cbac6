"""Trace the REAL jitted sampler loop (bench.py workload, fewer steps) and
aggregate device self-time by category — catches scheduler/CFG/prep costs
the per-forward profile misses."""
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.profile_step import parse_opstats


def main():
    from storygen_tpu.configs import UNetConfig, VAEConfig
    from storygen_tpu.models.unet import UNet2DConditionModel
    from storygen_tpu.models.vae import AutoencoderKL
    from storygen_tpu.pipeline import StoryGenSampler

    rng = jax.random.PRNGKey(0)
    b, n_refs, steps, hw = 1, 3, 5, 64
    unet = UNet2DConditionModel(config=UNetConfig(), dtype=jnp.bfloat16)
    unet_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray([0]),
        jnp.zeros((1, 77, 768)))
    vae = AutoencoderKL(config=VAEConfig(), dtype=jnp.bfloat16)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          {"unet": unet_params, "vae": vae_params})
    sampler = StoryGenSampler(unet, vae)
    ks = jax.random.split(rng, 8)
    latents = jax.random.normal(ks[0], (b, hw, hw, 4), jnp.float32)
    text_u = jax.random.normal(ks[1], (b, 77, 768), jnp.float32) * 0.02
    text_c = jax.random.normal(ks[2], (b, 77, 768), jnp.float32) * 0.02
    refs = jax.random.normal(ks[3], (n_refs, b, hw, hw, 4), jnp.float32)
    zero = jax.random.normal(ks[4], (b, hw, hw, 4), jnp.float32) * 0.01
    prev_u = jnp.tile(text_u[:, None], (1, n_refs, 1, 1))
    prev_c = jnp.tile(text_c[:, None], (1, n_refs, 1, 1))

    noise = jax.random.normal(ks[6], (b, hw, hw, 4), jnp.float32)

    def run():
        return sampler.sample(
            params, latents, text_u, text_c, refs, zero, prev_u, prev_c,
            noise, jnp.float32(7.0), jnp.float32(3.5),
            stage="auto-regressive", num_inference_steps=steps)

    jax.device_get(run())
    logdir = "/tmp/storygen_profile_loop"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = run()
        jax.device_get(out)

    import json
    import re
    raw = parse_opstats(logdir)
    table = json.loads(raw)
    if isinstance(table, list):
        table = table[0]
    cols = [c.get("id") or c.get("label") for c in table["cols"]]
    rows = [[(cell or {}).get("v") for cell in r["c"]]
            for r in table["rows"]]
    i_dev, i_op = cols.index("host_or_device"), cols.index("operation")
    i_self = cols.index("total_self_time")
    dev = [r for r in rows if r[i_dev] == "Device"]
    total = sum(float(r[i_self]) for r in dev)
    print(f"total device self: {total/1e3:.1f} ms for {steps} steps "
          f"-> {total/1e3/steps:.1f} ms/step")

    def cat(op):
        m = re.search(r"attn(\d)", op)
        if m:
            return f"attn{m.group(1)}"
        if "transformer_blocks" in op and ("net_0" in op or "net_2" in op):
            return "ff"
        if "conv" in op:
            return "conv"
        if "norm" in op or "resnets" in op:
            return "norm_resnet_misc"
        if "transformer" in op or "proj" in op:
            return "transformer_misc"
        if "while" in op or "dynamic" in op:
            return "loop_glue"
        if "fusion" in op:
            return "unattributed_fusion"
        return "misc"

    agg = {}
    for r in dev:
        agg.setdefault(cat(str(r[i_op])), []).append(float(r[i_self]))
    for c, ts in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
        s = sum(ts)
        print(f"{c:24s} {s/1e3/steps:>7.2f} ms/step {100*s/total:>5.1f}%  "
              f"({len(ts)} ops)")

    with open("/tmp/opstats_loop.tsv", "w") as f:
        for r in dev:
            f.write(f"{r[i_op]}\t{float(r[i_self]):.1f}\n")

    dev.sort(key=lambda r: -float(r[i_self]))
    print("\ntop unattributed/misc ops:")
    shown = 0
    for r in dev:
        c = cat(str(r[i_op]))
        if c in ("unattributed_fusion", "misc", "loop_glue",
                 "norm_resnet_misc"):
            print(f"  {str(r[i_op])[:90]:90s} {float(r[i_self])/1e3/steps:7.3f} ms/step")
            shown += 1
            if shown >= 20:
                break


if __name__ == "__main__":
    main()
