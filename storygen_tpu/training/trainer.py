"""Training driver: the `train(**config)` entrypoint for all three stages.

Capability parity with train_StorySalon_stage1.py / train_StorySalon_stage2.py
/ train_COCO.py `train()` (:104-362 in each): config-as-kwargs (YAML via
TrainConfig.from_yaml), trainable-subset finetuning, periodic validation
sampling (SampleLogger), periodic checkpointing, loss/lr logging.

Beyond the reference (SURVEY.md §5 gaps closed):
- resume-from-checkpoint including optimizer state (reference restarts at 0)
- data-parallel over a jax.sharding mesh instead of accelerate/DDP
- config dump to logdir for run reproducibility (utils/util.py parity)
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from storygen_tpu.checkpoint import hf_export, hf_import, orbax_io
from storygen_tpu.configs import (SchedulerConfig, TrainConfig, UNetConfig,
                                  VAEConfig, CLIPTextConfig)
from storygen_tpu.diffusion import schedule as S
from storygen_tpu.parallel import mesh as M
from storygen_tpu.training import optim, steps
from storygen_tpu.utils.logging import MetricLogger


class SampleLogger:
    """Render validation images every `validation_steps` (reference
    SampleLogger, train_StorySalon_stage2.py:30-102)."""

    def __init__(self, pipeline, logdir: str, stage: str = "auto-regressive",
                 subdir: str = "samples", num_samples_per_prompt: int = 1,
                 num_inference_steps: int = 40, guidance_scale: float = 7.0,
                 image_guidance_scale: float = 3.5,
                 height: int = 512, width: int = 512):
        self.pipeline = pipeline
        self.logdir = os.path.join(logdir, subdir)
        os.makedirs(self.logdir, exist_ok=True)
        self.stage = stage
        self.num_samples_per_prompt = num_samples_per_prompt
        self.kw = dict(num_inference_steps=num_inference_steps,
                       guidance_scale=guidance_scale,
                       image_guidance_scale=image_guidance_scale,
                       height=height, width=width)

    def set_unet_params(self, unet_params) -> None:
        """Push the LIVE model into the sampling pipeline. The reference
        samples from the training model itself
        (train_StorySalon_stage2.py:342-346); here the pipeline holds its
        own param tree, so the trained subtree must be merged in before
        every validation render."""
        self.pipeline.params["unet"] = unet_params

    def log_sample_images(self, batch: Dict, step: int) -> None:
        from PIL import Image
        prompts = batch.get("prompt", ["a story illustration"])
        if self.stage == "no":
            imgs = self.pipeline(stage="no", prompt=prompts, **self.kw)
        else:
            refs = np.asarray(batch["ref_images"])
            prev = batch.get("ref_prompts")
            prev = [[p[i] for p in prev] for i in range(len(prev[0]))] \
                if prev and isinstance(prev[0], list) else prev
            imgs = self.pipeline(stage=self.stage, prompt=prompts,
                                 image_prompt=refs, prev_prompt=prev,
                                 **self.kw)
        for i, img in enumerate(imgs):
            arr = (np.asarray(img) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(self.logdir, f"step{step}_{i}.png"))


def build_models(cfg: TrainConfig, dtype=jnp.float32):
    """Load pretrained components (diffusers folder) or random-init.

    The training UNet honors cfg.remat (per-block jax.checkpoint — the
    reference trains with gradient checkpointing at its bs-12 512px
    operating point, unet_2d_blocks.py:400-418) and cfg.attn_backend.
    """
    from storygen_tpu.models.unet import UNet2DConditionModel
    root = cfg.pretrained_model_path
    if root and os.path.isdir(os.path.join(root, "unet")):
        bundle = hf_import.load_diffusers_pretrained(root, dtype=dtype)
    else:
        # random init fallback (smoke/testing)
        from storygen_tpu.models.clip_text import init_clip_params
        from storygen_tpu.models.unet import init_unet_params
        from storygen_tpu.models.vae import AutoencoderKL
        rng = jax.random.PRNGKey(cfg.seed)
        unet_cfg, vae_cfg = UNetConfig(), VAEConfig()
        clip_cfg = CLIPTextConfig()
        unet, unet_params = init_unet_params(rng, unet_cfg, dtype=dtype)
        vae = AutoencoderKL(config=vae_cfg, dtype=dtype)
        vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
        clip, clip_params = init_clip_params(rng, clip_cfg, dtype=dtype)
        bundle = dict(unet=unet, unet_params=unet_params,
                      unet_config=unet_cfg,
                      vae=vae, vae_params=vae_params, vae_config=vae_cfg,
                      text_encoder=clip, text_params=clip_params,
                      clip_config=clip_cfg,
                      scheduler_config=SchedulerConfig())
    # rebind the UNet module with the training-time flags (params are
    # layout-identical across these flags). The flash forward variant is
    # threaded as a module attribute — not a process-global — so other
    # attention users in the same process (validation pipeline, a second
    # model) keep their own settings. The "bnd_guard" default is
    # unconditionally exact: it runs the fast bounded kernel only when
    # its exp2 domain provably holds and lax.cond-falls back to the
    # exact online-softmax kernel otherwise (ops/pallas_attention.py).
    bundle["unet"] = UNet2DConditionModel(
        config=bundle["unet_config"], dtype=dtype, remat=cfg.remat,
        attn_backend=cfg.attn_backend, attn_variant=cfg.attn_variant)
    return bundle


def train(stage: str = "stage2", config: Optional[TrainConfig] = None,
          dataset=None, val_dataset=None, tokenizer=None,
          sample_logger: Optional[SampleLogger] = None,
          models_bundle: Optional[dict] = None,
          **overrides) -> steps.TrainState:
    """Run a training stage end-to-end. Returns the final TrainState.

    stage: 'stage1' | 'stage2' | 'coco'.
    dataset/val_dataset: objects with __len__/__getitem__ yielding the
      dicts of data/datasets.py. tokenizer: callable list[str]->(B,77) ids.
    """
    cfg = config or TrainConfig(**overrides)
    if overrides and config is not None:
        cfg = dataclasses.replace(cfg, **overrides)
    os.makedirs(cfg.logdir, exist_ok=True)
    with open(os.path.join(cfg.logdir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    # "fp16" (the reference YAMLs' AMP flag) maps to bf16 on TPU
    dtype = (jnp.bfloat16 if cfg.mixed_precision in ("bf16", "fp16")
             else jnp.float32)
    bundle = models_bundle or build_models(cfg, dtype=dtype)
    unet, vae, clip = (bundle["unet"], bundle["vae"],
                       bundle["text_encoder"])
    sched = S.make_schedule(bundle["scheduler_config"])

    tx = optim.make_optimizer(cfg)
    trainable, frozen_unet = optim.partition_params(
        bundle["unet_params"], optim.STAGE_PREDICATES[stage])
    state = steps.init_train_state(trainable, tx)
    frozen = steps.FrozenBundle(unet_frozen=frozen_unet,
                                vae=bundle["vae_params"],
                                text=bundle["text_params"])

    ckpt_dir = os.path.join(cfg.logdir, "orbax")
    start = orbax_io.latest_step(ckpt_dir)
    if start is not None:
        state = orbax_io.restore_checkpoint(ckpt_dir, {"state": state})["state"]
        print(f"resumed from step {start}")

    maker = {"stage1": steps.make_stage1_step,
             "stage2": steps.make_stage2_step,
             "coco": steps.make_coco_step}[stage]
    step_fn = maker(unet, vae, clip, sched, tx)

    # multi-process (multi-host) runs use the global mesh over every
    # process's devices; single-process uses cfg.mesh_shape. Call
    # parallel.multihost.initialize() before train() to enable.
    from storygen_tpu.parallel import multihost as MH
    multi = jax.process_count() > 1
    mesh = MH.global_mesh() if multi else \
        M.make_mesh(int(np.prod(cfg.mesh_shape)))
    state_r = M.replicate(state, mesh)
    frozen_r = M.replicate(frozen, mesh)
    dp_step = M.jit_train_step(step_fn, mesh)
    place_batch = ((lambda b: MH.host_local_batch(b, mesh)) if multi
                   else (lambda b: M.shard_batch(b, mesh)))
    write_outputs = MH.is_coordinator()

    if sample_logger is None and cfg.validation_sample_logger is not None \
            and tokenizer is not None:
        # reference: SampleLogger(**validation_sample_logger, logdir=...)
        # (train_StorySalon_stage2.py:243-244)
        from storygen_tpu.pipeline import StoryGenPipeline
        pipe = StoryGenPipeline(
            unet, optim.merge_params(state.trainable, frozen_unet),
            vae, bundle["vae_params"], clip, bundle["text_params"],
            tokenizer, bundle["scheduler_config"])
        sample_logger = SampleLogger(pipe, cfg.logdir,
                                     **cfg.validation_sample_logger)

    from storygen_tpu.data.loader import DataLoader
    # per-process batch slice: each process loads 1/process_count of the
    # global batch; batch rows assemble into one global array in
    # host_local_batch (multi-host data sharding, SURVEY §2.4 DCN story)
    per_proc_bs = cfg.train_batch_size // jax.process_count() if multi \
        else cfg.train_batch_size
    loader = DataLoader(dataset, max(per_proc_bs, 1), tokenizer=tokenizer,
                        seed=cfg.seed, num_threads=cfg.loader_threads,
                        num_shards=jax.process_count(),
                        shard_id=jax.process_index())
    logger = MetricLogger(cfg.logdir)

    rng = jax.random.PRNGKey(cfg.seed)
    micro_steps = cfg.train_steps * cfg.gradient_accumulation_steps
    it = iter(loader)
    last_t, last_opt = time.time(), int(state.step) \
        // cfg.gradient_accumulation_steps
    # loss is averaged over the whole logging window ON DEVICE (a lazy
    # running sum adds one scalar op per micro-step, no host sync) — the
    # reference logs only the last micro-batch's loss, which is too noisy
    # to judge its 50k-step runs by
    loss_sum, loss_n = jnp.zeros((), jnp.float32), 0
    # Bound the async-dispatch depth to ~one optimizer step. JAX dispatch
    # is asynchronous and each enqueued micro-step pins its host batch
    # buffers (~55 MB at batch 4/512px) until the device executes it; a
    # host that outruns the chip — easy through a tunneled TPU at ~0.55
    # s/micro-step — otherwise enqueues unboundedly between the 50-step
    # logging syncs and OOMs the HOST (observed: 130 GB RSS, kernel
    # OOM-kill). Blocking on the PREVIOUS step's metrics keeps one full
    # step in flight (no pipeline bubble) and caps pinned memory at
    # ~2 optimizer steps of batches.
    prev_step_sync = None
    for micro in range(int(state.step), micro_steps):
        batch = place_batch(next(it))
        rng, sub = jax.random.split(rng)
        state_r, metrics = dp_step(state_r, frozen_r, batch, sub)
        loss_sum = loss_sum + metrics["loss"].astype(jnp.float32)
        loss_n += 1

        if (micro + 1) % cfg.gradient_accumulation_steps == 0:
            if prev_step_sync is not None:
                jax.block_until_ready(prev_step_sync)
            prev_step_sync = metrics["loss"]
            opt_step = (micro + 1) // cfg.gradient_accumulation_steps
            if opt_step % 50 == 0 or opt_step == 1:
                loss = float(jax.device_get(loss_sum)) / max(loss_n, 1)
                loss_sum, loss_n = jnp.zeros((), jnp.float32), 0
                now = time.time()
                if write_outputs:  # process 0 only on multi-host
                    logger.log(opt_step, {
                        "loss": loss,  # window mean over all micro-batches
                        "lr": optim.lr_at(cfg, opt_step),
                        "steps_per_sec":  # windowed, not lifetime-average
                            (opt_step - last_opt) / max(now - last_t, 1e-9)})
                last_t, last_opt = now, opt_step
            if write_outputs and sample_logger is not None \
                    and val_dataset is not None \
                    and opt_step % cfg.validation_steps == 0:
                # push the live trained subtree into the sampling pipeline
                host_state = jax.device_get(state_r)
                sample_logger.set_unet_params(
                    optim.merge_params(host_state.trainable, frozen_unet))
                from storygen_tpu.data.loader import collate
                vb = collate([val_dataset[opt_step % len(val_dataset)]])
                sample_logger.log_sample_images(vb, opt_step)
            if write_outputs and opt_step % cfg.checkpointing_steps == 0:
                host_state = jax.device_get(state_r)
                orbax_io.save_checkpoint(ckpt_dir, opt_step, host_state)
                # export the FULL pipeline folder the reference stack opens
                # (pipeline_save.save_pretrained parity,
                # train_StorySalon_stage2.py:348-357). The export is a
                # multi-GB host conversion that stalls the device loop
                # for minutes; export_steps (default = checkpointing
                # cadence) lets long runs keep cheap orbax saves only and
                # export offline from them (scripts/export_checkpoint.py)
                if opt_step % (cfg.export_steps
                               or cfg.checkpointing_steps) != 0:
                    continue
                full = optim.merge_params(host_state.trainable, frozen_unet)
                out_dir = os.path.join(cfg.logdir,
                                       f"checkpoint_{opt_step}")
                hf_export.save_pretrained(
                    out_dir, unet_params=full,
                    vae_params=bundle["vae_params"],
                    clip_params=bundle["text_params"],
                    configs={"unet": bundle.get("unet_config"),
                             "vae": bundle.get("vae_config"),
                             "clip": bundle.get("clip_config")},
                    scheduler_config=bundle["scheduler_config"])
                tok = getattr(tokenizer, "tok", tokenizer)
                if hasattr(tok, "save_pretrained"):
                    tok.save_pretrained(os.path.join(out_dir, "tokenizer"))
    return jax.device_get(state_r)
