"""Precompute VAE posterior moments for a StorySalon dataset.

Writes <out>/<index>.npz per training sample with latent_moments
(h, w, 8), ref_latent_moments (N, h, w, 8), mask, input_ids,
ref_input_ids. Training with these skips the per-step VAE+CLIP-tokenize
host work entirely (the reference re-encodes every step,
train_StorySalon_stage2.py:273-288) and shrinks IO 64x.

  python scripts/precompute_latents.py --ckpt <sd_folder> \
      --dataset ./StorySalon --out ./StorySalon_latents
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# canonical home (re-exported here for older callers):
from storygen_tpu.data.datasets import PrecomputedLatentDataset  # noqa: F401,E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
    from storygen_tpu.data.datasets import StorySalonDataset
    from storygen_tpu.data.loader import Tokenizer

    bundle = load_diffusers_pretrained(args.ckpt, dtype=jnp.bfloat16)
    vae, vae_params = bundle["vae"], bundle["vae_params"]
    tok_path = os.path.join(args.ckpt, "tokenizer")
    tokenizer = Tokenizer(tok_path if os.path.isdir(tok_path) else args.ckpt)
    # CFG dropout must happen at train time on latents, so disable here
    ds = StorySalonDataset(args.dataset, args.split, cfg_dropout=False)
    os.makedirs(args.out, exist_ok=True)

    @jax.jit
    def encode(imgs):
        dist = vae.apply(vae_params, imgs, method=vae.encode)
        return jnp.concatenate([dist.mean, dist.logvar], axis=-1)

    for i in range(len(ds)):
        out_p = os.path.join(args.out, f"{i:08d}.npz")
        if os.path.exists(out_p):
            continue
        s = ds[i]
        m = np.asarray(encode(jnp.asarray(s["image"][None])))[0]
        rm = np.asarray(encode(jnp.asarray(s["ref_images"])))
        np.savez_compressed(
            out_p,
            latent_moments=m.astype(np.float16),
            ref_latent_moments=rm.astype(np.float16),
            mask=s["mask"].astype(np.float16),
            input_ids=tokenizer([s["prompt"]])[0],
            ref_input_ids=tokenizer(s["ref_prompts"]))
        if i % 100 == 0:
            print(f"{i}/{len(ds)}")
    print("done")


if __name__ == "__main__":
    main()
