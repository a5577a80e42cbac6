"""Optimizer construction and trainable-subset partitioning.

Replaces the reference's requires_grad_(False) freezing + AdamW8bit
(train_StorySalon_stage2.py:168-205) with the functional equivalent:
the parameter pytree is split into (trainable, frozen); the optimizer and
grads only ever see the trainable subtree. That is both the optax-idiomatic
form of freezing and a memory win (no optimizer state for frozen params —
the same motivation as the reference's 8-bit Adam on 16 GB GPUs).

Gradient accumulation = optax.MultiSteps (reference: accelerate ga=8-10);
global-norm clipping matches accelerator.clip_grad_norm_ (max_grad_norm 1.0).
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import optax
from flax.traverse_util import flatten_dict, unflatten_dict

from storygen_tpu.configs import TrainConfig

Params = Any

# Trainable-subset predicates per training stage:
# stage1 finetunes self-attention only (train_StorySalon_stage1.py:175-179),
# stage2/COCO finetune the VLCM image-cross-attention only
# (train_StorySalon_stage2.py:173-177, train_COCO.py).
STAGE_PREDICATES = {
    "stage1": lambda path: "attn1" in path,
    "stage2": lambda path: "attn3" in path,
    "coco": lambda path: "attn3" in path,
    "full": lambda path: True,
}


def partition_params(params: Params,
                     predicate: Callable[[Tuple[str, ...]], bool]
                     ) -> Tuple[Params, Params]:
    """Split a params pytree into (trainable, frozen) by path predicate."""
    flat = flatten_dict(params["params"])
    train = {k: v for k, v in flat.items() if predicate(k)}
    frozen = {k: v for k, v in flat.items() if not predicate(k)}
    return ({"params": unflatten_dict(train)},
            {"params": unflatten_dict(frozen)})


def merge_params(trainable: Params, frozen: Params) -> Params:
    flat = dict(flatten_dict(frozen["params"]))
    flat.update(flatten_dict(trainable["params"]))
    return {"params": unflatten_dict(flat)}


def make_schedule(cfg: TrainConfig):
    """The lr schedule used by make_optimizer; also evaluable on host for
    logging the lr actually in effect at a given optimizer step."""
    lr = cfg.learning_rate
    if cfg.scale_lr:
        lr = lr * cfg.gradient_accumulation_steps * cfg.train_batch_size
    if cfg.lr_scheduler == "constant":
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(cfg.lr_warmup_steps, 1)),
             optax.constant_schedule(lr)],
            [max(cfg.lr_warmup_steps, 1)]) if cfg.lr_warmup_steps else lr
    elif cfg.lr_scheduler == "linear":
        schedule = optax.linear_schedule(lr, 0.0, cfg.train_steps)
    elif cfg.lr_scheduler == "cosine":
        schedule = optax.cosine_decay_schedule(lr, cfg.train_steps)
    else:
        raise ValueError(cfg.lr_scheduler)
    return schedule


def lr_at(cfg: TrainConfig, opt_step: int) -> float:
    """Learning rate in effect at optimizer step `opt_step` (for logging)."""
    schedule = make_schedule(cfg)
    if callable(schedule):
        return float(schedule(opt_step))
    return float(schedule)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm -> AdamW -> grad accumulation.

    use_8bit_adam=True (the reference YAMLs' bnb.optim.AdamW8bit flag,
    train_StorySalon_stage2.py:187-196) swaps in the int8-quantized-
    moment AdamW (training/optim8bit.py) — ~4x less optimizer-state HBM,
    which matters for the `full` finetune predicate at 512px."""
    schedule = make_schedule(cfg)
    if cfg.use_8bit_adam:
        from storygen_tpu.training.optim8bit import adamw_8bit
        adam = adamw_8bit(schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                          eps=cfg.adam_epsilon,
                          weight_decay=cfg.adam_weight_decay)
    else:
        adam = optax.adamw(schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                           eps=cfg.adam_epsilon,
                           weight_decay=cfg.adam_weight_decay)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), adam)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx
