"""End-to-end QUALITY loop on real hardware (VERDICT r2 #3).

train (stage-2 smoke at the reference operating point) -> generate the
held-out synthetic test windows through scripts-equivalent inference ->
score with the reference's metric protocol (CLIP-I / CLIP-T / PickScore /
FID; evaluation/calc_CLIP_image.py:36-53, calc_CLIP_text.py, calc_FID.sh)
-> write QUALITY.md + quality.json.

Zero-egress note: no public CLIP/Inception weights exist in this sandbox,
so the scorer models are SEEDED RANDOM-INIT transformers CLIP (ViT-B/32
shape) saved locally — the numbers are self-consistency metrics under the
reference protocol (reproducible across reruns; regenerating the images
from the same checkpoint reproduces them), not paper-comparable absolutes.
FID uses the same CLIP image tower as its feature extractor ("CLIP-FID").

Usage: python scripts/run_quality.py            # full loop (TPU, ~1-2 h)
       python scripts/run_quality.py --skip_train  # reuse the checkpoint
"""
import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_synth(root: str, stories: int, frames: int, test_stories: int):
    img_root = os.path.join(root, "image_inpainted_finally_checked")
    if (os.path.isdir(img_root)
            and len(os.listdir(img_root)) >= stories):
        return
    subprocess.check_call([sys.executable,
                           os.path.join(REPO, "scripts",
                                        "make_synth_storysalon.py"),
                           "--root", root, "--stories", str(stories),
                           "--frames", str(frames),
                           "--test-stories", str(test_stories)])


def ensure_clip(path: str):
    """Seeded random-init CLIP ViT-B/32-shaped scorer checkpoint."""
    if os.path.isdir(path) and os.path.exists(
            os.path.join(path, "config.json")):
        return
    import torch
    import transformers
    torch.manual_seed(0)
    cfg = transformers.CLIPConfig(
        text_config={"vocab_size": 49408, "hidden_size": 512,
                     "intermediate_size": 2048, "num_hidden_layers": 12,
                     "num_attention_heads": 8,
                     "max_position_embeddings": 77},
        vision_config={"hidden_size": 768, "intermediate_size": 3072,
                       "num_hidden_layers": 12, "num_attention_heads": 12,
                       "image_size": 224, "patch_size": 32},
        projection_dim=512)
    transformers.CLIPModel(cfg).save_pretrained(path)
    from transformers import (CLIPImageProcessor, CLIPProcessor,
                              CLIPTokenizerFast)
    tok = CLIPTokenizerFast.from_pretrained(
        "/root/reference/ckpt/stable-diffusion-v1-5/tokenizer")
    improc = CLIPImageProcessor(size={"shortest_edge": 224}, crop_size=224)
    CLIPProcessor(image_processor=improc, tokenizer=tok).save_pretrained(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/quality_run")
    ap.add_argument("--data", default="/tmp/synth_storysalon")
    ap.add_argument("--config", default=os.path.join(
        REPO, "configs", "stage2_tpu_smoke.yml"))
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--num_inference_steps", type=int, default=40)
    ap.add_argument("--platform", default=None)
    # opt-in speed knobs (BENCH.md "Opt-in accelerations"): rerun the
    # same protocol under a knob and diff the metrics against the exact
    # path to MEASURE the quality cost the knob table claims
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "dpm++", "pndm", "lms", "euler"])
    ap.add_argument("--ref_feature_interval", type=int, default=1)
    ap.add_argument("--out", default="quality.json",
                    help="output json filename under --root")
    # corpus sizing: defaults give 4 held-out stories x 13 windows = 52
    # test windows (VERDICT r3 #4: N>=50, report distributions not means)
    ap.add_argument("--stories", type=int, default=18)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--test-stories", type=int, default=4)
    # learning-curve support (VERDICT r4 #4): score any exported
    # checkpoint_<N> from the same training trajectory
    ap.add_argument("--ckpt_step", type=int, default=50)
    # ... or score an orbax save directly (no multi-GB export roundtrip):
    # trained subtree from <root>/train/orbax/<orbax_step>, frozen params
    # from --base_ckpt (the folder the run was initialized from)
    ap.add_argument("--orbax_step", type=int, default=None)
    ap.add_argument("--base_ckpt", default=None)
    ap.add_argument("--stage", default="stage2")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    ensure_synth(args.data, args.stories, args.frames, args.test_stories)
    train_dir = os.path.join(args.root, "train")
    ckpt = os.path.join(train_dir, f"checkpoint_{args.ckpt_step}")
    if args.orbax_step is not None:
        assert args.base_ckpt, "--orbax_step needs --base_ckpt"
        ckpt = args.base_ckpt

    # ---- 1. train the stage-2 smoke checkpoint (reference operating
    # point: eff. batch 96, lr 1e-5, masked MSE, attn3-only)
    if not args.skip_train or not os.path.isdir(ckpt):
        import yaml
        with open(args.config) as f:
            cfg_d = yaml.safe_load(f)
        cfg_d["logdir"] = train_dir
        cfg_d["dataset_path"] = args.data
        qcfg = os.path.join(args.root, "train_config.yml")
        with open(qcfg, "w") as f:
            yaml.safe_dump(cfg_d, f)
        cmd = [sys.executable, os.path.join(REPO, "scripts", "train.py"),
               "--stage", "stage2", "--config", qcfg]
        if args.platform:
            cmd += ["--platform", args.platform]
        subprocess.check_call(cmd, cwd=REPO)
    assert os.path.isdir(ckpt), f"no checkpoint at {ckpt}"

    # ---- 2. generate every held-out test window (3 GT refs -> target),
    # the reference inference protocol (inference.py:103-115 with GT refs)
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
    from storygen_tpu.data.datasets import StorySalonDataset
    from storygen_tpu.data.loader import Tokenizer
    from storygen_tpu.pipeline import StoryGenPipeline

    bundle = load_diffusers_pretrained(ckpt, dtype=jnp.bfloat16)
    if args.orbax_step is not None:
        import orbax.checkpoint as ocp
        from storygen_tpu.training import optim
        raw = ocp.StandardCheckpointer().restore(os.path.join(
            train_dir, "orbax", str(args.orbax_step)))
        trained = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                               raw["state"]["trainable"])
        _, frozen = optim.partition_params(
            bundle["unet_params"], optim.STAGE_PREDICATES[args.stage])
        bundle["unet_params"] = optim.merge_params(trained, frozen)
        ckpt = f"{train_dir}/orbax@{args.orbax_step} (base {args.base_ckpt})"
    tok_dir = os.path.join(args.base_ckpt or ckpt, "tokenizer")
    tokenizer = Tokenizer(tok_dir if os.path.isdir(tok_dir) else
                          "/root/reference/ckpt/stable-diffusion-v1-5")
    pipe = StoryGenPipeline(
        bundle["unet"], bundle["unet_params"], bundle["vae"],
        bundle["vae_params"], bundle["text_encoder"],
        bundle["text_params"], tokenizer, bundle["scheduler_config"])

    test_ds = StorySalonDataset(args.data, "test")
    tag = os.path.splitext(os.path.basename(args.out))[0]
    gen_dir = os.path.join(args.root,
                           "gen" if tag == "quality" else f"gen_{tag}")
    gt_dir = os.path.join(args.root, "gt")
    cap_dir = os.path.join(args.root, "captions")
    for d in (gen_dir, gt_dir, cap_dir):
        os.makedirs(d, exist_ok=True)

    captions = []
    for i in range(len(test_ds)):
        s = test_ds[i]
        refs = np.asarray(s["ref_images"])[:, None]  # (3,1,H,W,3) in [0,1]
        out = pipe(stage="auto-regressive", prompt=[s["prompt"]],
                   image_prompt=refs,
                   prev_prompt=[[p] for p in s["ref_prompts"]],
                   num_inference_steps=args.num_inference_steps,
                   guidance_scale=7.0, image_guidance_scale=3.5,
                   sampler=args.sampler,
                   ref_feature_interval=args.ref_feature_interval,
                   rng=jax.random.PRNGKey(i))
        Image.fromarray((out[0] * 255).astype(np.uint8)).save(
            os.path.join(gen_dir, f"{i:04d}.png"))
        gt = ((np.asarray(s["image"]) + 1.0) / 2.0 * 255).astype(np.uint8)
        Image.fromarray(gt).save(os.path.join(gt_dir, f"{i:04d}.png"))
        with open(os.path.join(cap_dir, f"{i:04d}.txt"), "w") as f:
            f.write(s["prompt"])
        captions.append(s["prompt"])
        print(f"generated window {i + 1}/{len(test_ds)}", flush=True)

    # ---- 3. score (reference protocol, local seeded scorer weights)
    clip_path = os.path.join(args.root, "clip_scorer")
    ensure_clip(clip_path)
    from storygen_tpu.evaluation.clip_scores import (CLIPScorer, PickScorer,
                                                     clip_i, clip_t)
    from storygen_tpu.evaluation.fid import fid_from_features
    gen_imgs = [Image.open(os.path.join(gen_dir, n)).convert("RGB")
                for n in sorted(os.listdir(gen_dir))]
    gt_imgs = [Image.open(os.path.join(gt_dir, n)).convert("RGB")
               for n in sorted(os.listdir(gt_dir))]
    scorer = CLIPScorer(clip_path)
    m_clip_i = clip_i(scorer, gen_imgs, gt_imgs)
    m_clip_t = clip_t(scorer, gen_imgs, captions)
    feats_gen = scorer.image_embed(gen_imgs)
    feats_gt = scorer.image_embed(gt_imgs)
    m_fid = fid_from_features(feats_gt, feats_gen)
    picker = PickScorer(clip_path, clip_path)
    picks = np.asarray([picker.score(c, [im])[0]
                        for c, im in zip(captions, gen_imgs)])

    # per-window score DISTRIBUTIONS (VERDICT r3 #4): the embeds are
    # already L2-normalized, so per-window CLIP-I/T are the row dots
    per_clip_i = np.sum(feats_gen * feats_gt, axis=-1)
    text_feats = scorer.text_embed(captions)
    per_clip_t = np.sum(feats_gen * text_feats, axis=-1)

    def dist(a):
        a = np.asarray(a, np.float64)
        return {"mean": float(a.mean()), "std": float(a.std()),
                "p10": float(np.percentile(a, 10)),
                "p50": float(np.percentile(a, 50)),
                "p90": float(np.percentile(a, 90)), "n": int(a.size)}

    metrics = {"clip_i": m_clip_i, "clip_t": m_clip_t,
               "clip_fid": m_fid, "pickscore": float(picks.mean()),
               "clip_i_dist": dist(per_clip_i),
               "clip_t_dist": dist(per_clip_t),
               "pickscore_dist": dist(picks),
               # raw per-window scores: two passes over the same windows
               # + seeds (PRNGKey(i)) compare PAIRED, not just by summary
               # stats (fast-operating-point certification, VERDICT r4 #1)
               "per_window": {"clip_i": [float(v) for v in per_clip_i],
                              "clip_t": [float(v) for v in per_clip_t],
                              "pickscore": [float(v) for v in picks]},
               "num_windows": len(test_ds),
               "num_inference_steps": args.num_inference_steps,
               "sampler": args.sampler,
               "ref_feature_interval": args.ref_feature_interval,
               "checkpoint": ckpt}
    with open(os.path.join(args.root, args.out), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
