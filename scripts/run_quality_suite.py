"""Multi-config QUALITY suite in ONE process (round-5 wall-clock rescue).

Separate run_quality.py invocations each pay the full model load +
sampler compile (~45 min on this 1-core host). This driver loads the
bundle ONCE, compiles each sampler program ONCE, and re-scores any
number of checkpoints by swapping the trained attn3 subtree in from
orbax saves (params are traced arguments, so a swap costs nothing).

Phase A (immediately): exact DDIM-40 + the fast operating points
  (dpm++25, dpm++25 + ref_feature_interval=2) on --first_step.
Phase B (after orbax/<final_step> appears): the same three programs on
  the final checkpoint + exact on the mid checkpoints (learning curve).

Writes one run_quality.py-schema JSON per (config, step) incrementally,
so partial progress survives a wall-clock kill.

  python scripts/run_quality_suite.py --root /tmp/chain \
      --data /tmp/synth_storysalon --base /tmp/chain/stage1/checkpoint_50 \
      --first_step 50 --final_step 500 --curve_steps 250
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def dist(a):
    a = np.asarray(a, np.float64)
    return {"mean": float(a.mean()), "std": float(a.std()),
            "p10": float(np.percentile(a, 10)),
            "p50": float(np.percentile(a, 50)),
            "p90": float(np.percentile(a, 90)), "n": int(a.size)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/chain")
    ap.add_argument("--data", default="/tmp/synth_storysalon")
    ap.add_argument("--base", required=True,
                    help="diffusers folder the run was initialized from")
    ap.add_argument("--first_step", type=int, default=50)
    ap.add_argument("--final_step", type=int, default=500)
    ap.add_argument("--curve_steps", type=int, nargs="*", default=[250])
    ap.add_argument("--stage", default="stage2")
    ap.add_argument("--poll_s", type=float, default=60.0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image
    import orbax.checkpoint as ocp
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
    from storygen_tpu.data.datasets import StorySalonDataset
    from storygen_tpu.data.loader import Tokenizer
    from storygen_tpu.pipeline import StoryGenPipeline
    from storygen_tpu.training import optim

    orbax_dir = os.path.join(args.root, "train", "orbax")
    print("loading base bundle (once)", flush=True)
    bundle = load_diffusers_pretrained(args.base, dtype=jnp.bfloat16)
    tok_dir = os.path.join(args.base, "tokenizer")
    tokenizer = Tokenizer(tok_dir if os.path.isdir(tok_dir) else
                          "/root/reference/ckpt/stable-diffusion-v1-5")
    _, frozen = optim.partition_params(
        bundle["unet_params"], optim.STAGE_PREDICATES[args.stage])
    pipe = StoryGenPipeline(
        bundle["unet"], bundle["unet_params"], bundle["vae"],
        bundle["vae_params"], bundle["text_encoder"],
        bundle["text_params"], tokenizer, bundle["scheduler_config"])

    def load_step(step):
        raw = ocp.StandardCheckpointer().restore(
            os.path.join(os.path.abspath(orbax_dir), str(step)))
        trained = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                               raw["state"]["trainable"])
        pipe.params["unet"] = optim.merge_params(trained, frozen)
        print(f"swapped in orbax@{step}", flush=True)

    test_ds = StorySalonDataset(args.data, "test")
    gt_dir = os.path.join(args.root, "gt")
    os.makedirs(gt_dir, exist_ok=True)
    captions = []
    for i in range(len(test_ds)):
        s = test_ds[i]
        captions.append(s["prompt"])
        p = os.path.join(gt_dir, f"{i:04d}.png")
        if not os.path.exists(p):
            gt = ((np.asarray(s["image"]) + 1.) / 2. * 255).astype(np.uint8)
            Image.fromarray(gt).save(p)

    # scorer setup once (CPU torch)
    from run_quality import ensure_clip
    clip_path = os.path.join(args.root, "clip_scorer")
    ensure_clip(clip_path)
    from storygen_tpu.evaluation.clip_scores import (CLIPScorer, PickScorer,
                                                     clip_i, clip_t)
    from storygen_tpu.evaluation.fid import fid_from_features
    scorer = CLIPScorer(clip_path)
    picker = PickScorer(clip_path, clip_path)
    gt_imgs = [Image.open(os.path.join(gt_dir, f"{i:04d}.png")).convert("RGB")
               for i in range(len(test_ds))]
    feats_gt = scorer.image_embed(gt_imgs)
    text_feats = scorer.text_embed(captions)

    def run_config(tag, step, sampler, nsteps, interval):
        out_p = os.path.join(args.root, f"quality_{tag}.json")
        if os.path.exists(out_p):
            print(f"skip {tag} (exists)", flush=True)
            return
        gen_dir = os.path.join(args.root, f"gen_{tag}")
        os.makedirs(gen_dir, exist_ok=True)
        t0 = time.time()
        for i in range(len(test_ds)):
            p = os.path.join(gen_dir, f"{i:04d}.png")
            if os.path.exists(p):
                continue
            s = test_ds[i]
            refs = np.asarray(s["ref_images"])[:, None]
            out = pipe(stage="auto-regressive", prompt=[s["prompt"]],
                       image_prompt=refs,
                       prev_prompt=[[c] for c in s["ref_prompts"]],
                       num_inference_steps=nsteps,
                       guidance_scale=7.0, image_guidance_scale=3.5,
                       sampler=sampler, ref_feature_interval=interval,
                       rng=jax.random.PRNGKey(i))
            Image.fromarray((out[0] * 255).astype(np.uint8)).save(p)
            if (i + 1) % 10 == 0:
                print(f"{tag}: {i + 1}/{len(test_ds)} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        gen_imgs = [Image.open(os.path.join(gen_dir, f"{i:04d}.png"))
                    .convert("RGB") for i in range(len(test_ds))]
        feats_gen = scorer.image_embed(gen_imgs)
        per_clip_i = np.sum(feats_gen * feats_gt, axis=-1)
        per_clip_t = np.sum(feats_gen * text_feats, axis=-1)
        picks = np.asarray([picker.score(c, [im])[0]
                            for c, im in zip(captions, gen_imgs)])
        metrics = {
            "clip_i": clip_i(scorer, gen_imgs, gt_imgs),
            "clip_t": clip_t(scorer, gen_imgs, captions),
            "clip_fid": fid_from_features(feats_gt, feats_gen),
            "pickscore": float(picks.mean()),
            "clip_i_dist": dist(per_clip_i),
            "clip_t_dist": dist(per_clip_t),
            "pickscore_dist": dist(picks),
            "per_window": {"clip_i": [float(v) for v in per_clip_i],
                           "clip_t": [float(v) for v in per_clip_t],
                           "pickscore": [float(v) for v in picks]},
            "num_windows": len(test_ds),
            "num_inference_steps": nsteps, "sampler": sampler,
            "ref_feature_interval": interval,
            "checkpoint": f"{orbax_dir}@{step} (base {args.base})"}
        with open(out_p, "w") as f:
            json.dump(metrics, f, indent=2)
        print(f"{tag}: done in {time.time() - t0:.0f}s "
              + json.dumps({k: metrics[k] for k in
                            ("clip_i", "clip_fid", "pickscore")}),
              flush=True)

    configs = [("exact", "ddim", 40, 1),
               ("dpm25_ri2", "dpm++", 25, 2),
               ("dpm25", "dpm++", 25, 1)]

    # phase A: first checkpoint (compiles each program once). The plain
    # dpm25 point is deferred to phase B so the final-checkpoint passes
    # start the moment training ends (wall-clock priority: certification
    # at the final checkpoint > a third config at the first one).
    s = args.first_step
    load_step(s)
    for name, sampler, nsteps, interval in configs[:2]:
        run_config(f"{name}_s{s}", s, sampler, nsteps, interval)

    # phase B: wait for the final checkpoint, then swap-and-rescore
    s = args.final_step
    while not os.path.isdir(os.path.join(orbax_dir, str(s))):
        print(f"waiting for orbax@{s}", flush=True)
        time.sleep(args.poll_s)
    time.sleep(10)  # let the save finish
    load_step(s)
    for name, sampler, nsteps, interval in configs:
        run_config(f"{name}_s{s}", s, sampler, nsteps, interval)

    # learning-curve mid-points, exact protocol only
    for s in args.curve_steps:
        if not os.path.isdir(os.path.join(orbax_dir, str(s))):
            continue
        load_step(s)
        run_config(f"exact_s{s}", s, "ddim", 40, 1)
    print("suite complete", flush=True)


if __name__ == "__main__":
    main()
