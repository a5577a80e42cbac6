"""Trace the REAL jitted stage-2 train step and aggregate device
self-time by category — the training counterpart of profile_sampler.py.
Decides where train-step optimization effort goes (e.g. whether the conv
backward's tap re-reads are worth a fused dw kernel).

Usage: python scripts/profile_train.py [--batch 4] [--precomputed]
"""
import argparse
import json
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.profile_step import parse_opstats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--precomputed", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from storygen_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                      TrainConfig, UNetConfig, VAEConfig)
    from storygen_tpu.diffusion import schedule as S
    from storygen_tpu.models.clip_text import CLIPTextModel
    from storygen_tpu.models.unet import UNet2DConditionModel
    from storygen_tpu.models.vae import AutoencoderKL
    from storygen_tpu.training import optim, steps

    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(config=UNetConfig(), dtype=dtype, remat=True)
    unet_params = jax.jit(unet.init)(rng, jnp.zeros((1, 16, 16, 4)),
                                     jnp.asarray([0]),
                                     jnp.zeros((1, 77, 768)))
    vae = AutoencoderKL(config=VAEConfig(), dtype=dtype)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    clip = CLIPTextModel(config=CLIPTextConfig(), dtype=dtype)
    clip_params = jax.jit(clip.init)(rng, jnp.zeros((1, 77), jnp.int32))

    cfg = TrainConfig(gradient_accumulation_steps=1)
    tx = optim.make_optimizer(cfg)
    trainable, frozen_unet = optim.partition_params(
        unet_params, optim.STAGE_PREDICATES["stage2"])
    sched = S.make_schedule(SchedulerConfig())
    step = jax.jit(steps.make_stage2_step(unet, vae, clip, sched, tx),
                   donate_argnums=(0,))
    state = steps.init_train_state(trainable, tx)
    frozen = steps.FrozenBundle(
        unet_frozen=jax.tree.map(lambda x: x.astype(dtype), frozen_unet),
        vae=jax.tree.map(lambda x: x.astype(dtype), vae_params),
        text=clip_params)

    b, img = args.batch, 512
    r = np.random.RandomState(0)
    if args.precomputed:
        h = img // 8
        batch = {
            "latent_moments": jnp.asarray(r.randn(b, h, h, 8), dtype) * 0.3,
            "ref_latent_moments": jnp.asarray(r.randn(3, b, h, h, 8),
                                              dtype) * 0.3,
            "mask": jnp.asarray(r.rand(b, img, img, 1) > 0.8, jnp.float32),
            "input_ids": jnp.asarray(r.randint(0, 49408, (b, 77)),
                                     jnp.int32),
            "ref_input_ids": jnp.asarray(r.randint(0, 49408, (3, b, 77)),
                                         jnp.int32),
        }
    else:
        batch = {
            "image": jnp.asarray(r.randn(b, img, img, 3), dtype) * 0.2,
            "mask": jnp.asarray(r.rand(b, img, img, 1) > 0.8, jnp.float32),
            "input_ids": jnp.asarray(r.randint(0, 49408, (b, 77)),
                                     jnp.int32),
            "ref_images": jnp.asarray(r.randn(3, b, img, img, 3),
                                      dtype) * 0.2,
            "ref_input_ids": jnp.asarray(r.randint(0, 49408, (3, b, 77)),
                                         jnp.int32),
        }

    state, m = step(state, frozen, batch, jax.random.PRNGKey(1))
    jax.device_get(m["loss"])

    logdir = "/tmp/storygen_profile_train"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(args.steps):
            state, m = step(state, frozen, batch, jax.random.PRNGKey(2 + i))
        jax.device_get(m["loss"])

    table = json.loads(parse_opstats(logdir))
    if isinstance(table, list):
        table = table[0]
    cols = [c.get("id") or c.get("label") for c in table["cols"]]
    rows = [[(cell or {}).get("v") for cell in rr["c"]]
            for rr in table["rows"]]
    i_dev, i_op = cols.index("host_or_device"), cols.index("operation")
    i_self = cols.index("total_self_time")
    dev = [rr for rr in rows if rr[i_dev] == "Device"]
    total = sum(float(rr[i_self]) for rr in dev)
    n = args.steps
    print(f"total device self: {total/1e3:.1f} ms for {n} steps "
          f"-> {total/1e3/n:.1f} ms/step (batch {b}, "
          f"precomputed={args.precomputed})")

    def cat(op):
        m2 = re.search(r"attn(\d)", op)
        if m2:
            return f"attn{m2.group(1)}"
        if "transformer_blocks" in op and ("net_0" in op or "net_2" in op):
            return "ff"
        if "conv" in op:
            return "conv"
        if "norm" in op or "resnets" in op:
            return "norm_resnet_misc"
        if "transformer" in op or "proj" in op:
            return "transformer_misc"
        if "adam" in op.lower() or "opt" in op:
            return "optimizer"
        if "while" in op or "dynamic" in op:
            return "loop_glue"
        if "fusion" in op:
            return "unattributed_fusion"
        return "misc"

    agg = {}
    for rr in dev:
        agg.setdefault(cat(str(rr[i_op])), []).append(float(rr[i_self]))
    for c, ts in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
        s = sum(ts)
        print(f"{c:24s} {s/1e3/n:>8.2f} ms/step {100*s/total:>5.1f}%  "
              f"({len(ts)} ops)")

    with open("/tmp/opstats_train.tsv", "w") as f:
        for rr in dev:
            f.write(f"{rr[i_op]}\t{float(rr[i_self]):.1f}\n")

    dev.sort(key=lambda rr: -float(rr[i_self]))
    print("\ntop ops:")
    for rr in dev[:25]:
        print(f"  {str(rr[i_op])[:90]:90s} "
              f"{float(rr[i_self])/1e3/n:7.3f} ms/step")


if __name__ == "__main__":
    main()
