"""Jitted training steps for the three StoryGen training regimes.

Capability parity:
- stage1 (style pretrain): single-frame denoising, trainable attn1, masked
  MSE (train_StorySalon_stage1.py:175-179,268-291).
- stage2 (VLCM): per-step reference-cycle feature collection from 3 prior
  frames, random 1-3 refs used, trainable attn3, masked MSE
  (train_StorySalon_stage2.py:258-332).
- COCO: 3 entity-segment refs, equal ref noise (no decay), unmasked MSE
  (train_COCO.py:301-315).

TPU-first re-design:
- One fused jitted step: VAE encode + CLIP encode + reference cycle + main
  UNet pass + loss + grads + optimizer, all on-device.
- The reference runs 1-3 serial reference UNet forwards with grads enabled
  (train_StorySalon_stage2.py:309-314). Here all N refs run as ONE batched
  forward under stop_gradient: every parameter in the reference cycle is
  frozen in stage 2, so no gradient flows through it — skipping its
  backward halves the step FLOPs at identical gradients.
- "Random number of refs" becomes a per-sample attn3 kv mask over a
  static (B, N*S) context: same marginal distribution as the reference's
  per-step draw (3 refs w.p. 0.3, 2 w.p. 0.3, 1 w.p. 0.4, newest-first),
  but static shapes (no recompiles) and richer per-batch signal.
- Gradients/optimizer only touch the trainable subtree (optim.py).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from storygen_tpu.diffusion import schedule as S
from storygen_tpu.training.losses import downsample_mask, masked_mse
from storygen_tpu.training.optim import merge_params

Params = Any


class TrainState(NamedTuple):
    step: jax.Array
    trainable: Params          # the optimized subtree (attn1 or attn3)
    opt_state: optax.OptState


class FrozenBundle(NamedTuple):
    unet_frozen: Params        # non-trainable UNet subtree
    vae: Params
    text: Params


def init_train_state(trainable: Params,
                     tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      opt_state=tx.init(trainable))


def _sample_ref_mask(rng: jax.Array, batch: int, num_refs: int,
                     probs=(0.3, 0.3, 0.4)) -> jax.Array:
    """Per-sample mask keeping the newest k refs, k ~ {N, N-1, ..., 1}.

    The reference keeps refs i >= k0 (the *later* = temporally closer,
    less-noised frames; train_StorySalon_stage2.py:309-310).
    """
    k0 = jax.random.choice(rng, jnp.arange(num_refs),
                           shape=(batch,), p=jnp.asarray(probs))
    idx = jnp.arange(num_refs)[None, :]
    return idx >= k0[:, None]  # (B, N) bool


def make_train_step(unet, vae, text_encoder, sched: S.NoiseSchedule,
                    tx: optax.GradientTransformation, *,
                    stage: str = "stage2", num_refs: int = 3,
                    ref_noise_decay: bool = True, use_mask: bool = True,
                    num_train_timesteps: int = 1000) -> Callable:
    """Build the jitted train step for a stage.

    stage: 'stage1' (no refs) | 'stage2' | 'coco'.
    ref_noise_decay: noise ref i at ref_t*(N-i) (stage2 auto-regressive
      semantics) vs flat ref_t (COCO).
    use_mask: masked MSE over the inpainting mask.

    Batch layout (all device arrays):
      image: (B, H, W, 3) in [-1, 1]
      mask: (B, H, W, 1) in [0, 1] (if use_mask)
      input_ids: (B, 77) int32
      ref_images: (N, B, H, W, 3) (stages with refs)
      ref_input_ids: (N, B, 77)

    Precomputed-latent mode (scripts/precompute_latents.py): pass
    `latent_moments` (B, h, w, 8) and `ref_latent_moments` (N, B, h, w, 8)
    instead of image/ref_images — the step samples the VAE posterior from
    the stored (mean, logvar) and skips the encoders entirely (the
    reference re-encodes every step, train_StorySalon_stage2.py:273-288).
    """
    use_refs = stage != "stage1"
    sf = vae.config.scaling_factor

    def _sample_moments(moments: jax.Array, key: jax.Array,
                        dtype=None) -> jax.Array:
        from storygen_tpu.models.vae import DiagonalGaussian
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        z = DiagonalGaussian(mean, jnp.clip(logvar, -30.0, 20.0)
                             ).sample(key) * sf
        return z.astype(dtype) if dtype is not None else z

    def step_fn(state: TrainState, frozen: FrozenBundle, batch: Dict,
                rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        ks = jax.random.split(rng, 6)

        # --- frozen encoders -------------------------------------------
        # compute dtype of the encoder path: match what vae.encode would
        # have produced so the precomputed program equals the image one
        vdt = jax.tree_util.tree_leaves(frozen.vae)[0].dtype
        if "latent_moments" in batch:
            latents = _sample_moments(batch["latent_moments"], ks[0],
                                      dtype=vdt)
        else:
            latents = vae.apply(frozen.vae, batch["image"],
                                method=vae.encode).sample(ks[0]) * sf
        b = latents.shape[0]
        text = text_encoder.apply(frozen.text, batch["input_ids"])

        noise = jax.random.normal(ks[1], latents.shape, latents.dtype)
        t = jax.random.randint(ks[2], (b,), 0, num_train_timesteps)
        noisy_latent = S.add_noise(sched, latents, noise, t)

        # --- reference cycle (stop-gradient: all its params are frozen) --
        ctx = None
        ref_mask = None
        if use_refs:
            n = num_refs
            ref_keys = jax.random.split(ks[3], n)
            if "ref_latent_moments" in batch:
                ref_lat = jax.vmap(
                    lambda m, k: _sample_moments(m, k, dtype=vdt))(
                    batch["ref_latent_moments"], ref_keys)
            else:
                ref_imgs = batch["ref_images"]
                import os
                form = os.environ.get("STORYGEN_REF_ENCODE", "batched")
                if form == "map":
                    # one ref-group at a time under lax.map: smallest
                    # peak HBM. r4 chip measurement: all three forms tie
                    # at 591-598 ms/step (the r3 944 ms was the encoder
                    # conv stack, not lax.map scheduling; BENCH.md r4)
                    def enc(args):
                        imgs, key = args
                        return vae.apply(frozen.vae, imgs,
                                         method=vae.encode).sample(key) * sf

                    ref_lat = jax.lax.map(enc, (ref_imgs, ref_keys))
                elif form == "unroll":
                    ref_lat = jnp.stack([
                        vae.apply(frozen.vae, ref_imgs[i],
                                  method=vae.encode).sample(ref_keys[i]) * sf
                        for i in range(n)])
                else:  # "batched": one (N*B) encoder call
                    flat = ref_imgs.reshape((n * b,) + ref_imgs.shape[2:])
                    dist = vae.apply(frozen.vae, flat, method=vae.encode)
                    z = dist.sample(ks[3]) * sf
                    ref_lat = z.reshape((n, b) + z.shape[1:])
            ref_noise = jax.random.normal(ks[4], latents.shape,
                                          latents.dtype)
            ref_t = t // 10  # train_StorySalon_stage2.py:295-297
            if ref_noise_decay:
                factors = jnp.arange(n, 0, -1)  # N..1 (stage2.py:311)
                ref_ts = ref_t[None, :] * factors[:, None]  # (N, B)
            else:
                ref_ts = jnp.broadcast_to(ref_t[None, :], (n, b))
            noisy_refs = S.add_noise(sched, ref_lat, ref_noise[None], ref_ts)

            prev_ids = batch["ref_input_ids"].reshape(n * b, -1)
            prev_text = text_encoder.apply(frozen.text, prev_ids)

            full_params = merge_params(state.trainable, frozen.unet_frozen)
            _, raw_ctx = unet.apply(
                full_params, noisy_refs.reshape((n * b,) + ref_lat.shape[2:]),
                ref_ts.reshape(-1), prev_text)
            # (N*B, S, C) -> (B, N*S, C), refs concatenated on seq dim
            # (train_StorySalon_stage2.py:316-318)
            ctx = {
                k: jax.lax.stop_gradient(
                    v.reshape((n, b) + v.shape[1:])
                     .transpose(1, 0, 2, 3)
                     .reshape((b, n * v.shape[1], v.shape[2])))
                for k, v in raw_ctx.items()
            }
            if stage == "stage2":
                ref_mask = _sample_ref_mask(ks[5], b, n)

        latent_mask = None
        if use_mask:
            latent_mask = downsample_mask(batch["mask"])

        # --- differentiated main pass -----------------------------------
        def loss_fn(trainable):
            params = merge_params(trainable, frozen.unet_frozen)
            pred, _ = unet.apply(params, noisy_latent, t, text, ctx,
                                 ref_mask)
            return masked_mse(pred, noise, latent_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
        # data-parallel: grads/loss are averaged by pjit's psum when the
        # batch axis is sharded (parallel/mesh.py); nothing explicit here.
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(step=state.step + 1, trainable=trainable,
                               opt_state=opt_state)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return step_fn


def make_stage1_step(unet, vae, text_encoder, sched, tx):
    return make_train_step(unet, vae, text_encoder, sched, tx,
                           stage="stage1", use_mask=True)


def make_stage2_step(unet, vae, text_encoder, sched, tx, num_refs: int = 3):
    return make_train_step(unet, vae, text_encoder, sched, tx,
                           stage="stage2", num_refs=num_refs,
                           ref_noise_decay=True, use_mask=True)


def make_coco_step(unet, vae, text_encoder, sched, tx, num_refs: int = 3):
    return make_train_step(unet, vae, text_encoder, sched, tx,
                           stage="coco", num_refs=num_refs,
                           ref_noise_decay=False, use_mask=False)
