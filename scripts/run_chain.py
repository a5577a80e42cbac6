"""Chained reference training workflow, one driver invocation (VERDICT r4 #3/#4).

The reference's primary training story chains its two stages: stage 2 is
initialized FROM the stage-1 checkpoint (/root/reference/config/
stage2_config.yml `pretrained_model_path: "./stage1_log/"`, loaded at
train_StorySalon_stage2.py:143-148). This driver runs that chain end-to-end
on hardware, extended with the round-5 learning-curve protocol:

  1. stage-1 train (attn1-only, masked MSE) -> diffusers export
  2. precompute VAE posterior moments from the stage-1 export, then
     stage-2 train (attn3-only) initialized from that export,
     `--steps` optimizer steps (default 500), orbax save every 50
     (diffusers export kept OFF the training loop; see export_steps)
  3. auto-regressive sampling + scoring of the 52 held-out windows at
     the first/mid/final checkpoints (exact DDIM-40 protocol) -> held-out
     CLIP-I learning curve, plus fast-operating-point passes
     (dpm++25, dpm++25 + ref_feature_interval=2) — all in ONE process
     (scripts/run_quality_suite.py; load/compile shared across passes)
  4. offline export of the final reference-openable checkpoint folder
     (scripts/export_checkpoint.py)

Artifacts: <root>/stage1/ (stage-1 log+export), <root>/train/ (stage-2 log
+ checkpoints), <root>/quality_*.json (per-pass metrics), <root>/chain.json
(summary: loss curve points + per-checkpoint metric distributions).

Usage: python scripts/run_chain.py                # full chain (~4-5 h)
       python scripts/run_chain.py --steps 500 --score_steps 100 250 500
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    subprocess.check_call(cmd, cwd=REPO, **kw)


def write_cfg(base_yaml: str, out_path: str, **overrides):
    import yaml
    with open(base_yaml) as f:
        d = yaml.safe_load(f)
    d.update(overrides)
    with open(out_path, "w") as f:
        yaml.safe_dump(d, f)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/chain")
    ap.add_argument("--data", default="/tmp/synth_storysalon")
    ap.add_argument("--steps", type=int, default=500,
                    help="stage-2 optimizer steps")
    ap.add_argument("--stage1_steps", type=int, default=50)
    ap.add_argument("--ckpt_every", type=int, default=50)
    ap.add_argument("--score_steps", type=int, nargs="+",
                    default=[100, 250, 500],
                    help="stage-2 checkpoints to run the exact QUALITY "
                         "pass on (held-out CLIP-I learning curve)")
    ap.add_argument("--no_latents", action="store_true",
                    help="stage-2 with in-step VAE encodes (the reference "
                         "default regime) instead of precomputed moments")
    ap.add_argument("--skip_stage1", action="store_true")
    ap.add_argument("--skip_stage2", action="store_true")
    ap.add_argument("--skip_fast_points", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    plat = ["--platform", args.platform] if args.platform else []

    # ---- 0. synthetic StorySalon-layout corpus (18 stories x 16 frames,
    # 4 held-out stories = 52 test windows; QUALITY.md round-4 sizing)
    img_root = os.path.join(args.data, "image_inpainted_finally_checked")
    if not (os.path.isdir(img_root) and len(os.listdir(img_root)) >= 18):
        run([sys.executable, "scripts/make_synth_storysalon.py",
             "--root", args.data, "--stories", "18", "--frames", "16",
             "--test-stories", "4"])

    # ---- 1. stage-1: attn1-only finetune, export at the final step
    stage1_dir = os.path.join(args.root, "stage1")
    stage1_ckpt = os.path.join(stage1_dir, f"checkpoint_{args.stage1_steps}")
    if not args.skip_stage1 and not os.path.isdir(stage1_ckpt):
        cfg = write_cfg(os.path.join(REPO, "configs/stage1_tpu_smoke.yml"),
                        os.path.join(args.root, "stage1_config.yml"),
                        logdir=stage1_dir, dataset_path=args.data,
                        train_steps=args.stage1_steps,
                        checkpointing_steps=args.stage1_steps,
                        validation_steps=10 ** 6)
        run([sys.executable, "scripts/train.py", "--stage", "stage1",
             "--config", cfg] + plat)
    assert os.path.isdir(stage1_ckpt), f"no stage-1 export at {stage1_ckpt}"

    # ---- 1b. precompute VAE posterior moments from the stage-1 export
    # (the VAE is frozen in both stages, so these are exact for stage 2;
    # the BENCH.md-recommended regime — 328 vs 572 ms/micro-step)
    latents_dir = None
    if not args.no_latents:
        latents_dir = os.path.join(args.root, "latents")
        done_flag = os.path.join(latents_dir, ".complete")
        if not os.path.exists(done_flag):
            run([sys.executable, "scripts/precompute_latents.py",
                 "--ckpt", stage1_ckpt, "--dataset", args.data,
                 "--out", latents_dir])
            open(done_flag, "w").close()

    # ---- 2. stage-2 from the stage-1 export (the reference chain:
    # stage2_config.yml pretrained_model_path -> stage1_log)
    train_dir = os.path.join(args.root, "train")
    final_ckpt = os.path.join(train_dir, f"checkpoint_{args.steps}")
    if not args.skip_stage2 and not os.path.isdir(final_ckpt):
        cfg = write_cfg(os.path.join(REPO, "configs/stage2_tpu_smoke.yml"),
                        os.path.join(args.root, "stage2_config.yml"),
                        logdir=train_dir, dataset_path=args.data,
                        pretrained_model_path=stage1_ckpt,
                        latents_path=latents_dir,
                        train_steps=args.steps,
                        checkpointing_steps=args.ckpt_every,
                        # keep only cheap orbax saves in-loop: the hf
                        # export is ~35 min of loop stall per checkpoint
                        # on this host (BENCH.md r5); the final folder is
                        # reconstructed offline below
                        export_steps=10 ** 9,
                        validation_steps=10 ** 6,
                        validation_sample_logger=None)
        run([sys.executable, "scripts/train.py", "--stage", "stage2",
             "--config", cfg] + plat)

    # ---- 3+4. QUALITY learning curve + fast-operating-point
    # certification, one process (load/compile shared across passes):
    # exact DDIM-40 at first/mid/final orbax saves, dpm++25 and
    # dpm++25+ref_feature_interval=2 at first+final (scripts/
    # run_quality_suite.py). Certification verdicts via
    # scripts/compare_quality.py afterwards.
    mids = [s for s in args.score_steps if s != args.steps]
    run([sys.executable, "scripts/run_quality_suite.py",
         "--root", args.root, "--data", args.data,
         "--base", stage1_ckpt, "--first_step", str(args.ckpt_every),
         "--final_step", str(args.steps)]
        + (["--curve_steps"] + [str(s) for s in mids] if mids else []))

    # offline export of the final reference-openable pipeline folder
    if not os.path.isdir(final_ckpt):
        run([sys.executable, "scripts/export_checkpoint.py",
             "--base", stage1_ckpt,
             "--orbax", os.path.join(train_dir, "orbax"),
             "--step", str(args.steps), "--out", final_ckpt])

    def quality(tag):
        path = os.path.join(args.root, f"quality_{tag}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    curve = {s: quality(f"exact_s{s}")
             for s in [args.ckpt_every] + mids + [args.steps]}
    fast = {}
    if not args.skip_fast_points:
        for s in (args.ckpt_every, args.steps):
            fast[f"dpm25_s{s}"] = quality(f"dpm25_s{s}")
            fast[f"dpm25_ri2_s{s}"] = quality(f"dpm25_ri2_s{s}")

    # ---- 5. summary: windowed loss curve from the trainer's JSONL +
    # per-checkpoint metric distributions
    loss_points = []
    metrics_jsonl = os.path.join(train_dir, "metrics.jsonl")
    if os.path.exists(metrics_jsonl):
        with open(metrics_jsonl) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
        loss_points = [{"step": r["step"], "loss": r["loss"]}
                       for r in rows if "loss" in r]
    summary = {"stage1_ckpt": stage1_ckpt, "stage2_steps": args.steps,
               "loss_curve": loss_points,
               "quality_curve": {str(k): v for k, v in curve.items()},
               "fast_points": fast}
    with open(os.path.join(args.root, "chain.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary)[:2000])


if __name__ == "__main__":
    main()
