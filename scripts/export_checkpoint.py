"""Offline diffusers-folder export from an orbax train checkpoint.

The in-loop hf export is a multi-GB host conversion that stalls the
device loop for many minutes per checkpoint (measured ~35 min at 512px
SD-1.5 scale through the sandbox tunnel). With
TrainConfig.export_steps set high, the trainer keeps only cheap orbax
saves (trainable subtree + optimizer state, ~0.5 GB) and this script
reconstructs the full reference-openable pipeline folder on CPU, off
the training critical path: frozen params come from the base folder the
run was initialized from (they never changed — the stages train attn1/
attn3 subtrees only), the trained subtree from orbax.

  python scripts/export_checkpoint.py --base /tmp/chain/stage1/checkpoint_50 \
      --orbax /tmp/chain/train/orbax --step 250 --stage stage2 \
      --out /tmp/chain/train/checkpoint_250
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True,
                    help="diffusers folder the run was initialized from")
    ap.add_argument("--orbax", required=True, help="<logdir>/orbax dir")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--stage", default="stage2",
                    choices=["stage1", "stage2", "coco", "full"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # pure host work
    from storygen_tpu.checkpoint import hf_export, orbax_io
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
    from storygen_tpu.training import optim

    bundle = load_diffusers_pretrained(args.base)
    import orbax.checkpoint as ocp
    step = args.step or orbax_io.latest_step(args.orbax)
    raw = ocp.StandardCheckpointer().restore(
        os.path.join(os.path.abspath(args.orbax), str(step)))
    trained = raw["state"]["trainable"]

    _, frozen = optim.partition_params(
        bundle["unet_params"], optim.STAGE_PREDICATES[args.stage])
    merged = optim.merge_params(trained, frozen)

    hf_export.save_pretrained(
        args.out, unet_params=merged, vae_params=bundle["vae_params"],
        clip_params=bundle["text_params"],
        configs={"unet": bundle.get("unet_config"),
                 "vae": bundle.get("vae_config"),
                 "clip": bundle.get("clip_config")},
        scheduler_config=bundle["scheduler_config"])
    tok_src = os.path.join(args.base, "tokenizer")
    if os.path.isdir(tok_src):
        import shutil
        shutil.copytree(tok_src, os.path.join(args.out, "tokenizer"),
                        dirs_exist_ok=True)
    print(f"exported step {step} -> {args.out}")


if __name__ == "__main__":
    main()
