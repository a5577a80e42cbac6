"""Training-step throughput on TPU: full-size stage-2 step (reference
config semantics: 512px, 3 refs, masked MSE, trainable attn3).

Usage: python scripts/bench_train.py [--batch 4] [--remat]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--remat", dest="remat", action="store_true",
                    default=True)
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--attn", default="auto", choices=["auto", "xla"])
    ap.add_argument("--variant", default="bnd_guard",
                    choices=["bnd_guard", "online_t", "bnd", "grid"],
                    help="flash forward variant (training default "
                         "bnd_guard — the exact guarded bounded kernel, "
                         "matching TrainConfig.attn_variant)")
    ap.add_argument("--precomputed", action="store_true",
                    help="train from precomputed VAE latent moments")
    ap.add_argument("--stage", default="stage2",
                    choices=["stage1", "stage2", "coco", "full"],
                    help="trainable-subset predicate; 'full' trains every "
                         "UNet param (the regime where 8-bit Adam state "
                         "matters)")
    ap.add_argument("--opt", default="fp32", choices=["fp32", "8bit"],
                    help="Adam moment storage (8bit = optim8bit.adamw_8bit"
                         ", reference bnb AdamW8bit equivalent)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ref-encode", default=None,
                    choices=["map", "unroll", "batched"],
                    help="in-step ref VAE-encode formulation "
                         "(sets STORYGEN_REF_ENCODE; default = module "
                         "default). Only meaningful without --precomputed.")
    args = ap.parse_args()
    if args.ref_encode:
        os.environ["STORYGEN_REF_ENCODE"] = args.ref_encode

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from storygen_tpu.configs import (CLIPTextConfig, SchedulerConfig,
                                      TrainConfig, UNetConfig, VAEConfig)
    from storygen_tpu.diffusion import schedule as S
    from storygen_tpu.models.clip_text import CLIPTextModel
    from storygen_tpu.models.unet import UNet2DConditionModel
    from storygen_tpu.models.vae import AutoencoderKL
    from storygen_tpu.training import optim, steps
    from storygen_tpu.ops.attention import set_default_backend
    set_default_backend(args.attn)
    from storygen_tpu.ops import pallas_attention
    pallas_attention.FORWARD_VARIANT = args.variant

    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    unet = UNet2DConditionModel(config=UNetConfig(), dtype=dtype,
                                remat=args.remat)
    unet_params = jax.jit(unet.init)(rng, jnp.zeros((1, 16, 16, 4)),
                                     jnp.asarray([0]),
                                     jnp.zeros((1, 77, 768)))
    vae = AutoencoderKL(config=VAEConfig(), dtype=dtype)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    clip = CLIPTextModel(config=CLIPTextConfig(), dtype=dtype)
    clip_params = jax.jit(clip.init)(rng, jnp.zeros((1, 77), jnp.int32))

    cfg = TrainConfig(gradient_accumulation_steps=1,
                      use_8bit_adam=args.opt == "8bit")
    tx = optim.make_optimizer(cfg)
    trainable, frozen_unet = optim.partition_params(
        unet_params, optim.STAGE_PREDICATES[args.stage])
    sched = S.make_schedule(SchedulerConfig())
    step = jax.jit(steps.make_stage2_step(unet, vae, clip, sched, tx),
                   donate_argnums=(0,))
    state = steps.init_train_state(trainable, tx)
    # frozen activations/weights in bf16 on device
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
    try:  # HBM footprint after one step (optimizer state resident)
        stats = jax.local_devices()[0].memory_stats()
        print(f"HBM in use: {stats['bytes_in_use']/2**30:.2f} GiB "
              f"(peak {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB)")
    except Exception as e:
        print(f"memory_stats unavailable: {e}")
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, m = step(state, frozen, batch, jax.random.PRNGKey(2 + i))
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.stage} train step: batch {b} remat={args.remat} "
          f"attn={args.attn} opt={args.opt} "
          f"precomputed={args.precomputed}: "
          f"{dt*1e3:.0f} ms/step, "
          f"{b/dt:.2f} samples/s/chip, loss={float(m['loss']):.4f}")


if __name__ == "__main__":
    main()
