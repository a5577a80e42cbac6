"""Training losses.

Masked noise-prediction MSE: the StorySalon images are inpainted where
humans/text were removed, and the loss excludes those regions:
mse(pred*(1-mask), noise*(1-mask)) with the mask bilinearly downsampled 8x
to latent resolution and broadcast over the 4 latent channels
(train_StorySalon_stage2.py:268-270,325). COCO training uses the unmasked
variant (train_COCO.py:315).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def downsample_mask(mask: jax.Array, factor: int = 8) -> jax.Array:
    """(B, H, W, 1) -> (B, H/f, W/f, 1) bilinear (align_corners=False).

    Matches F.interpolate(scale_factor=1/8, mode="bilinear",
    align_corners=False) which, for integer factors, equals area-style
    bilinear resampling; jax.image.resize("linear") implements the same
    half-pixel-center convention.
    """
    b, h, w, c = mask.shape
    # antialias=False: torch bilinear samples only the 2x2 neighborhood of
    # each half-pixel-center target point (no low-pass), unlike jax's
    # antialiased default.
    return jax.image.resize(mask, (b, h // factor, w // factor, c),
                            method="linear", antialias=False)


def masked_mse(pred: jax.Array, target: jax.Array,
               latent_mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean squared error over unmasked latent pixels.

    latent_mask: (B, h, w, 1) in [0,1], 1 = excluded (inpainted) region.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if latent_mask is None:
        return jnp.mean((pred - target) ** 2)
    keep = 1.0 - latent_mask.astype(jnp.float32)
    return jnp.mean((pred * keep - target * keep) ** 2)
