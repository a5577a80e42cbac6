"""Story inference CLI (reference inference.py:24-150 parity).

Example:
  python scripts/inference.py --ckpt ./ckpt/stable-diffusion-v1-5 \\
      --logdir ./out --stage auto-regressive \\
      --prompt "The angry girl sat on the old chair." \\
      --ref_image prev1.png prev2.png prev3.png \\
      --ref_prompt "..." "..." "..." \\
      --num_inference_steps 40 --guidance_scale 7 --image_guidance_scale 3.5
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="diffusers-layout checkpoint folder")
    ap.add_argument("--logdir", default="./inference_out")
    ap.add_argument("--stage", default="auto-regressive",
                    choices=["no", "multi-image-condition",
                             "auto-regressive"])
    ap.add_argument("--prompt", required=True, nargs="+",
                    help="one caption = single frame; several = full "
                         "autoregressive story rollout")
    ap.add_argument("--ref_image", nargs="*", default=[])
    ap.add_argument("--ref_prompt", nargs="*", default=[])
    ap.add_argument("--num_inference_steps", type=int, default=40)
    ap.add_argument("--guidance_scale", type=float, default=7.0)
    ap.add_argument("--image_guidance_scale", type=float, default=3.5)
    ap.add_argument("--num_sample_per_prompt", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "dpm++", "pndm", "lms", "euler",
                             "euler_a"])
    ap.add_argument("--eta", type=float, default=0.0,
                    help="DDIM stochasticity (reference eta kwarg, "
                         "model/pipeline.py:287)")
    ap.add_argument("--ref_feature_interval", type=int, default=1,
                    help="recompute VLCM ref features every k-th step "
                         "(1=exact; 2 ~1.45x faster, minor drift)")
    ap.add_argument("--reuse_latents", action="store_true",
                    help="story rollout: condition on previous frames' "
                         "final latents instead of decode->re-encode "
                         "(speed knob, not reference parity)")
    ap.add_argument("--fused", action="store_true",
                    help="story rollout: run the whole story as ONE "
                         "jitted program (one dispatch per story; same "
                         "algorithm, float32-roundoff-equal frames)")
    ap.add_argument("--normalize_refs", action="store_true",
                    help="feed story-rollout history refs in [-1,1] "
                         "instead of the reference-checkpoint [0,1] quirk")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent XLA compile cache (the 512px sampler loop is a
    # minutes-long remote compile on a tunneled chip)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
    from storygen_tpu.data.loader import Tokenizer
    from storygen_tpu.pipeline import StoryGenPipeline

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    bundle = load_diffusers_pretrained(args.ckpt, dtype=dtype)
    tok_path = os.path.join(args.ckpt, "tokenizer")
    tokenizer = Tokenizer(tok_path if os.path.isdir(tok_path) else args.ckpt)

    pipe = StoryGenPipeline(
        bundle["unet"], bundle["unet_params"], bundle["vae"],
        bundle["vae_params"], bundle["text_encoder"], bundle["text_params"],
        tokenizer, bundle["scheduler_config"])

    refs = None
    if args.ref_image:
        # [0,1] refs: reference-checkpoint convention (see data/datasets.py)
        imgs = [np.asarray(Image.open(p).convert("RGB").resize((512, 512)),
                           dtype=np.float32) / 255.0
                for p in args.ref_image]
        refs = np.stack(imgs)[:, None]  # (N, B=1, H, W, 3)

    os.makedirs(args.logdir, exist_ok=True)
    if len(args.prompt) > 1:
        # multi-frame story rollout (each frame conditions on the
        # previous ones through the VLCM)
        first = refs[0, 0] / 1.0 if refs is not None else None
        frames = pipe.generate_story(
            args.prompt, first_frame=first,
            first_caption=args.ref_prompt[0] if args.ref_prompt else None,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            image_guidance_scale=args.image_guidance_scale,
            sampler=args.sampler, eta=args.eta,
            ref_feature_interval=args.ref_feature_interval,
            normalize_refs=args.normalize_refs,
            reuse_latents=args.reuse_latents, fused=args.fused,
            rng=jax.random.PRNGKey(args.seed))
        for i, f in enumerate(frames):
            Image.fromarray((f * 255).astype(np.uint8)).save(
                os.path.join(args.logdir, f"story_frame{i}.png"))
        print(f"saved {len(frames)}-frame story")
        return
    # all samples for the prompt run as ONE batched sampler call
    # (reference _encode_prompt duplication, model/pipeline.py:87-196)
    out = pipe(stage=args.stage, prompt=args.prompt,
               image_prompt=refs,
               prev_prompt=[[p] for p in args.ref_prompt] or None,
               num_inference_steps=args.num_inference_steps,
               guidance_scale=args.guidance_scale,
               image_guidance_scale=args.image_guidance_scale,
               rng=jax.random.PRNGKey(args.seed),
               sampler=args.sampler, eta=args.eta,
               ref_feature_interval=args.ref_feature_interval,
               num_images_per_prompt=args.num_sample_per_prompt)
    for s in range(args.num_sample_per_prompt):
        img = (out[s] * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(args.logdir, f"{args.seed + s}_output.png"))
    print(f"saved {args.num_sample_per_prompt} samples")


if __name__ == "__main__":
    main()
