"""Training CLI for all three stages (reference train_*.py __main__ parity:
train(**OmegaConf.load(config))).

  python scripts/train.py --stage stage2 --config configs/stage2_config.yml
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compile cache: the 512px train step + validation sampler
# are minutes-long remote compiles; cache them across runs like bench.py
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="stage2",
                    choices=["stage1", "stage2", "coco"])
    ap.add_argument("--config", required=True)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator address host:port "
                         "(or set JAX_COORDINATOR_ADDRESS)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    # multi-host: must run before the backend is first touched
    from storygen_tpu.parallel import multihost
    multihost.initialize(args.coordinator, args.num_processes,
                         args.process_id)
    from storygen_tpu.configs import TrainConfig
    from storygen_tpu.data.datasets import (COCOMultiSegDataset,
                                            StorySalonDataset)
    from storygen_tpu.data.loader import Tokenizer
    from storygen_tpu.training.trainer import train

    cfg = TrainConfig.from_yaml(args.config)
    if cfg.latents_path:
        # precomputed VAE posterior moments + token ids (the BENCH.md
        # recommended regime; scripts/precompute_latents.py)
        from storygen_tpu.data.datasets import PrecomputedLatentDataset
        dataset = PrecomputedLatentDataset(cfg.latents_path)
        val_dataset = (None if args.stage == "coco"
                       else StorySalonDataset(cfg.dataset_path, "test"))
    elif args.stage == "coco":
        dataset = COCOMultiSegDataset(cfg.dataset_path, seed=cfg.seed)
        val_dataset = None
    else:
        dataset = StorySalonDataset(cfg.dataset_path, "train", seed=cfg.seed)
        val_dataset = StorySalonDataset(cfg.dataset_path, "test")

    tok_path = cfg.tokenizer_path or os.path.join(
        cfg.pretrained_model_path, "tokenizer")
    tokenizer = Tokenizer(tok_path if os.path.isdir(tok_path)
                          else cfg.pretrained_model_path)

    train(stage=args.stage, config=cfg, dataset=dataset,
          val_dataset=val_dataset, tokenizer=tokenizer)


if __name__ == "__main__":
    main()
