"""COCO val sweep with PickScore re-ranking
(reference inference_COCO_val.py:42-154 parity): generate
num_samples_per_prompt candidates per val image, keep the PickScore argmax;
skips already-generated outputs (the reference's poor-man's resume,
inference_COCO_val.py:117-118).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--coco_root", required=True)
    ap.add_argument("--caption_dir", default=None)
    ap.add_argument("--logdir", default="./coco_val_out")
    ap.add_argument("--pickscore_processor", default=None,
                    help="local CLIP-H processor path")
    ap.add_argument("--pickscore_model", default=None,
                    help="local PickScore_v1 path")
    ap.add_argument("--num_samples", type=int, default=10)
    ap.add_argument("--samples_per_batch", type=int, default=5,
                    help="candidates generated per sampler call (the 10 "
                    "default candidates run as 2 batched calls)")
    ap.add_argument("--num_inference_steps", type=int, default=40)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from PIL import Image
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
    from storygen_tpu.data.datasets import COCOValMultiSegDataset
    from storygen_tpu.data.loader import Tokenizer
    from storygen_tpu.pipeline import StoryGenPipeline

    bundle = load_diffusers_pretrained(args.ckpt, dtype=jnp.bfloat16)
    tok_path = os.path.join(args.ckpt, "tokenizer")
    tokenizer = Tokenizer(tok_path if os.path.isdir(tok_path) else args.ckpt)
    pipe = StoryGenPipeline(
        bundle["unet"], bundle["unet_params"], bundle["vae"],
        bundle["vae_params"], bundle["text_encoder"], bundle["text_params"],
        tokenizer, bundle["scheduler_config"])

    scorer = None
    if args.pickscore_model:
        from storygen_tpu.evaluation.clip_scores import PickScorer
        scorer = PickScorer(args.pickscore_processor, args.pickscore_model)

    ds = COCOValMultiSegDataset(args.coco_root, caption_dir=args.caption_dir)
    os.makedirs(args.logdir, exist_ok=True)
    for i in range(len(ds)):
        sample = ds[i]
        name = os.path.basename(sample["image_path"])
        out_path = os.path.join(args.logdir, name)
        if os.path.exists(out_path):
            continue
        refs = sample["ref_images"][:, None]
        candidates = []
        per = max(1, min(args.samples_per_batch, args.num_samples))
        for s0 in range(0, args.num_samples, per):
            nb = min(per, args.num_samples - s0)
            out = pipe(stage="multi-image-condition",
                       prompt=[sample["prompt"]], image_prompt=refs,
                       prev_prompt=[[p] for p in sample["ref_prompts"]],
                       num_inference_steps=args.num_inference_steps,
                       rng=jax.random.PRNGKey(1000 * i + s0),
                       num_images_per_prompt=nb)
            candidates.extend(
                Image.fromarray((out[s] * 255).astype(np.uint8))
                for s in range(nb))
        best = scorer.best_of(sample["prompt"], candidates) if scorer else 0
        candidates[best].save(out_path)
        print(f"[{i}/{len(ds)}] {name} -> sample {best}")


if __name__ == "__main__":
    main()
