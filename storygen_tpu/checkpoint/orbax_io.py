"""Native checkpointing via Orbax + training resume.

The reference can only SAVE (pipeline.save_pretrained every 5000 steps,
train_StorySalon_stage2.py:348-357) — it has no resume path and never
checkpoints optimizer state (SURVEY.md §5). This module adds both:
save/restore of the full train state (step, trainable params, optimizer
state) plus the frozen bundles, so training is preemption-safe — a
first-class concern on TPU pods.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    extra: Optional[dict] = None) -> str:
    """Write an orbax checkpoint at ckpt_dir/<step>."""
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": state}
    if extra:
        payload.update(extra)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, template: Any,
                       step: Optional[int] = None) -> Any:
    """Restore the payload saved by save_checkpoint into `template`'s
    structure (pytree of arrays with matching shapes/dtypes)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template)
