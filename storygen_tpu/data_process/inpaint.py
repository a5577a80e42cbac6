"""Masked-region inpainting on TPU (data_process/SDM/inpaint.py parity).

The reference shells out to the external CompVis latent-diffusion
inpainting repo (DDIM 25 steps) and composites
(1-mask)*image + mask*prediction (inpaint.py:76-95). Here inpainting is
TPU-native: RePaint-style masked DDIM with OUR OWN VAE + UNet inside one
jitted fori_loop — at every step the known region is re-injected at the
current noise level, so only masked pixels are synthesized. No external
model or repo required.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion import schedule as S


class TPUInpainter:
    def __init__(self, unet, vae, sched_cfg: SchedulerConfig = SchedulerConfig()):
        self.unet = unet
        self.vae = vae
        self.sched_cfg = sched_cfg
        self.schedule = S.make_schedule(sched_cfg)

    @functools.partial(jax.jit, static_argnums=(0,),
                       static_argnames=("num_inference_steps",))
    def inpaint_latents(self, params, latents0: jax.Array,
                        latent_mask: jax.Array, text_emb: jax.Array,
                        rng: jax.Array, *,
                        num_inference_steps: int = 25) -> jax.Array:
        """latents0: (B, h, w, 4) clean latents of the original image.
        latent_mask: (B, h, w, 1), 1 = region to regenerate.
        Returns inpainted latents."""
        sched = self.schedule
        ts = S.ddim_timesteps(self.sched_cfg, num_inference_steps)
        ratio = self.sched_cfg.num_train_timesteps // num_inference_steps
        t_arr = jnp.asarray(ts, jnp.int32)
        prev_arr = jnp.concatenate(
            [t_arr[1:], jnp.asarray([ts[-1] - ratio], jnp.int32)])

        k_init, k_loop = jax.random.split(rng)
        noise = jax.random.normal(k_init, latents0.shape, jnp.float32)
        x = S.add_noise(sched, latents0, noise, t_arr[0])

        def body(i, x):
            t, prev_t = t_arr[i], prev_arr[i]
            eps, _ = self.unet.apply(params["unet"], x, t, text_emb)
            x_prev = S.ddim_step(sched, eps.astype(jnp.float32), t, prev_t,
                                 x)
            # re-inject the known region at the new noise level
            known = jnp.where(prev_t >= 0,
                              S.add_noise(sched, latents0, noise,
                                          jnp.maximum(prev_t, 0)),
                              latents0)
            return known * (1.0 - latent_mask) + x_prev * latent_mask

        x = jax.lax.fori_loop(0, num_inference_steps, body, x)
        return latents0 * (1.0 - latent_mask) + x * latent_mask

    def inpaint_image(self, params, text_params, text_encoder, tokenizer,
                      image: np.ndarray, mask: np.ndarray,
                      prompt: str = "", rng: Optional[jax.Array] = None,
                      num_inference_steps: int = 25) -> np.ndarray:
        """image: (H, W, 3) in [0,1]; mask: (H, W) {0,1}; returns (H, W, 3)
        with masked regions regenerated and a pixel-space composite
        (inpaint.py:92-95 behavior)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_enc, k_loop = jax.random.split(rng)
        img = jnp.asarray(image, jnp.float32)[None] * 2.0 - 1.0
        sf = self.vae.config.scaling_factor
        dist = self.vae.apply(params["vae"], img, method=self.vae.encode)
        lat0 = dist.sample(k_enc) * sf
        m = jnp.asarray(mask, jnp.float32)[None, :, :, None]
        lat_mask = (jax.image.resize(
            m, (1, lat0.shape[1], lat0.shape[2], 1), "linear",
            antialias=False) > 0).astype(jnp.float32)
        ids = jnp.asarray(tokenizer([prompt]), jnp.int32)
        text = text_encoder.apply(text_params, ids)
        lat = self.inpaint_latents(params, lat0, lat_mask, text, k_loop,
                                   num_inference_steps=num_inference_steps)
        dec = self.vae.apply(params["vae"], lat / sf,
                             method=self.vae.decode)
        out = np.asarray(jnp.clip(dec[0].astype(jnp.float32) / 2 + 0.5,
                                  0, 1))
        m3 = np.asarray(m[0])
        return image * (1 - m3) + out * m3
