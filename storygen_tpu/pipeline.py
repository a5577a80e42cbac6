"""StoryGen inference engine: autoregressive visual storytelling on TPU.

Capability parity with model/pipeline.py's StableDiffusionPipeline.__call__
(:273-484): three stages ('no' plain text2img, 'multi-image-condition',
'auto-regressive'), three-way classifier-free guidance (:448-458), per-step
reference-cycle UNet passes collecting VLCM features (:417-443), DDIM
updates (:461), and VAE decode (:472).

TPU-first re-design (not a port):
- The whole denoising loop is ONE jitted function: `lax.fori_loop` over
  DDIM steps with static shapes; timestep tables are precomputed arrays.
- The reference runs one UNet forward PER REFERENCE FRAME per step
  (pipeline.py:418-438, serially). Here all reference frames run as a
  single batched UNet call of batch 3B*N — the MXU sees one large matmul
  stream instead of N small ones.
- Stage 'no' runs a 2-row CFG batch ([uncond, cond]) instead of the
  reference's degenerate 3-row batch — identical output (rows 0 and 1 are
  equal without image conditioning), 1/3 less compute.
- RNG is explicit jax.random keys; fp32 CFG/scheduler math around a
  bf16-able UNet.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from storygen_tpu.configs import SchedulerConfig
from storygen_tpu.diffusion import schedule as S

Params = Any

STAGES = ("no", "multi-image-condition", "auto-regressive")


def _ref_timesteps(stage: str, ref_t: jax.Array, num_refs: int) -> jax.Array:
    """Noise level per reference frame: 'auto-regressive' decays older
    frames harder (ref_t*(N-i), pipeline.py:420), 'multi-image-condition'
    noises all refs equally (:423)."""
    if stage == "auto-regressive":
        factors = jnp.arange(num_refs, 0, -1, dtype=ref_t.dtype)  # N..1
        return ref_t * factors
    return jnp.broadcast_to(ref_t, (num_refs,))


class StoryGenSampler:
    """Pure-function sampler core. Host-side orchestration (tokenizer, PIL)
    lives in StoryGenPipeline below."""

    def __init__(self, unet, vae, sched_cfg: SchedulerConfig = SchedulerConfig()):
        self.unet = unet
        self.vae = vae
        self.sched_cfg = sched_cfg
        self.schedule = S.make_schedule(sched_cfg)

    # ---------------------------------------------------------------- refs
    def encode_ref_latents(self, vae_params, images: jax.Array,
                           rng: jax.Array) -> jax.Array:
        """VAE-encode reference frames: (N, B, H, W, 3) -> (N, B, h, w, 4),
        scaled by 0.18215 (pipeline.py:399-404)."""
        n, b = images.shape[:2]
        flat = images.reshape((n * b,) + images.shape[2:])
        dist = self.vae.apply(vae_params, flat, method=self.vae.encode)
        z = dist.sample(rng) * self.vae.config.scaling_factor
        return z.reshape((n, b) + z.shape[1:])

    # ---------------------------------------------------------------- loop
    @functools.partial(jax.jit, static_argnums=(0,),
                       static_argnames=("stage", "num_inference_steps",
                                        "sampler", "eta",
                                        "ref_feature_interval"))
    def sample(self, params: Dict[str, Params], latents: jax.Array,
               text_emb_uncond: jax.Array, text_emb_cond: jax.Array,
               ref_latents: Optional[jax.Array],
               zero_latents: Optional[jax.Array],
               prev_text_uncond: Optional[jax.Array],
               prev_text_cond: Optional[jax.Array],
               noise: jax.Array,
               guidance_scale: jax.Array, image_guidance_scale: jax.Array,
               *, stage: str, num_inference_steps: int,
               sampler: str = "ddim", eta: float = 0.0,
               sample_rng: Optional[jax.Array] = None,
               ref_feature_interval: int = 1) -> jax.Array:
        """Run the full DDIM denoising loop inside one jit.

        Args:
          params: {"unet": ..., "vae": ...} flax variables.
          latents: (B, h, w, 4) initial N(0,1) latents.
          text_emb_{uncond,cond}: (B, 77, 768) CLIP features of the target
            prompt and the empty prompt.
          ref_latents: (N, B, h, w, 4) VAE-encoded reference frames
            (scaled), or None for stage 'no'.
          zero_latents: (B, h, w, 4) VAE encoding of the zero image
            (pipeline.py:391-394), or None.
          prev_text_{uncond,cond}: (N, B, 77, 768) per-ref caption features.
          noise: (B, h, w, 4) the single noise draw reused for ref noising
            across steps (pipeline.py:409).
          guidance_scale / image_guidance_scale: scalars (traced).
          sampler: 'ddim' (reference parity, pipeline.py:461), 'dpm++'
            (DPM-Solver++(2M): ~half the steps for DDIM-50 quality),
            'pndm' (PLMS — the scheduler class the SD-1.5 checkpoint's
            scheduler_config.json names; runs n+1 UNet steps for n),
            'lms', 'euler', or 'euler_a' (reference scheduler-union
            parity, model/pipeline.py:9-12; 'euler_a' needs sample_rng).
          eta: DDIM stochasticity (reference eta kwarg, pipeline.py:287;
            default 0 = deterministic). Needs sample_rng when > 0.
          ref_feature_interval: recompute the reference-cycle VLCM features
            every k-th denoise step, reusing the cached features otherwise
            (block-caching acceleration, cf. arXiv:2312.03209; ref noise
            levels move slowly — ref_t = t//10). 1 = exact reference
            parity; 2 cuts ~40% of per-step compute at minor quality cost.
        Returns final latents (B, h, w, 4).
        """
        from storygen_tpu.diffusion import dpm_solver as D
        from storygen_tpu.diffusion import euler as E
        from storygen_tpu.diffusion import lms as L
        from storygen_tpu.diffusion import pndm as P
        if sampler not in ("ddim", "dpm++", "pndm", "lms", "euler",
                           "euler_a"):
            raise ValueError(f"unknown sampler {sampler!r}")
        if (eta > 0.0 or sampler == "euler_a") and sample_rng is None:
            raise ValueError("eta > 0 / euler_a need sample_rng")
        sched = self.schedule
        if sampler == "pndm":
            # PLMS visits the second timestep twice (n+1 UNet steps); the
            # counter==1 coefficient juggling is folded into static arrays
            t_eval, t_cf, prev_cf = P.plms_timesteps(self.sched_cfg,
                                                     num_inference_steps)
            t_arr = jnp.asarray(t_eval, jnp.int32)
            tcoeff_arr = jnp.asarray(t_cf, jnp.int32)
            prev_arr = jnp.asarray(prev_cf, jnp.int32)
        elif sampler == "lms":
            t_eval, sig_np, coeffs = L.lms_tables(self.sched_cfg,
                                                  num_inference_steps)
            t_arr = jnp.asarray(t_eval, jnp.float32)
            sigma_arr = jnp.asarray(sig_np, jnp.float32)
            coeff_arr = jnp.asarray(coeffs, jnp.float32)
            prev_arr = None
        else:
            ts = S.ddim_timesteps(self.sched_cfg, num_inference_steps)
            ratio = self.sched_cfg.num_train_timesteps // num_inference_steps
            t_arr = jnp.asarray(ts, dtype=jnp.int32)
            prev_arr = jnp.concatenate(
                [t_arr[1:], jnp.asarray([ts[-1] - ratio], jnp.int32)])
        n_iters = int(t_arr.shape[0])

        b = latents.shape[0]
        use_refs = stage in ("multi-image-condition", "auto-regressive")

        if use_refs:
            num_refs = ref_latents.shape[0]
            # main-pass text: [uncond, uncond, cond] (pipeline.py:448)
            text3 = jnp.concatenate(
                [text_emb_uncond, text_emb_uncond, text_emb_cond], axis=0)
            # Reference-pass CFG rows: the reference runs 3 rows per ref
            # ([zero,ref,ref] x [uncond,cond,cond], pipeline.py:429-430) —
            # but rows 1 and 2 are IDENTICAL (ref latent, cond caption).
            # Run 2 rows and reuse the features for row 2: exact, and cuts
            # the reference pass by a third.
            prev2 = jnp.concatenate(
                [prev_text_uncond, prev_text_cond], axis=1
            )  # (N, 2B, 77, 768)
            prev2_flat = prev2.reshape((num_refs * 2 * b,) + prev2.shape[2:])
        else:
            text2 = jnp.concatenate([text_emb_uncond, text_emb_cond], axis=0)

        def unet_apply(sample, t, text, ctx=None):
            out, collected = self.unet.apply(params["unet"], sample, t, text,
                                             ctx)
            return out, collected

        is_euler = sampler in ("euler", "euler_a")

        def body(i, carry):
            latents, dpm_state = carry[0], carry[1]
            t = t_arr[i]
            prev_t = prev_arr[i] if prev_arr is not None else None
            # Euler/LMS samplers carry x in sigma space (x = x0 + sigma*eps)
            # and the UNet sees scale_model_input(x) (diffusers
            # EulerDiscreteScheduler/LMSDiscreteScheduler semantics; the
            # DDIM family's scale_model_input is the identity).
            if is_euler:
                model_lat = E.scale_model_input(sched, latents, t)
            elif sampler == "lms":
                model_lat = L.scale_model_input(latents, sigma_arr[i])
            else:
                model_lat = latents

            if use_refs:
                def compute_ctx(_):
                    ref_t = t // 10  # pipeline.py:414 (t/10 as integer)
                    ref_ts = _ref_timesteps(stage, ref_t, num_refs)  # (N,)
                    noisy_refs = S.add_noise(sched, ref_latents,
                                             noise[None], ref_ts)
                    if stage == "multi-image-condition":
                        # All refs share ref_t here, so the reference's N
                        # zero-image rows are IDENTICAL — run ONE zero row
                        # group + N ref groups ((N+1)B rows vs the
                        # reference's 3NB). Exact.
                        noisy_zero1 = S.add_noise(sched, zero_latents,
                                                  noise, ref_t)
                        stack = jnp.concatenate(
                            [noisy_zero1[None], noisy_refs], axis=0)
                        text_stack = jnp.concatenate(
                            [prev_text_uncond[:1], prev_text_cond], axis=0)
                        flat = stack.reshape(((num_refs + 1) * b,)
                                             + stack.shape[2:])
                        tx_flat = text_stack.reshape(
                            ((num_refs + 1) * b,) + text_stack.shape[2:])
                        t_flat = jnp.broadcast_to(ref_t,
                                                  ((num_refs + 1) * b,))
                        _, raw = unet_apply(flat, t_flat, tx_flat)

                        def expand(v):
                            g = v.reshape((num_refs + 1, b) + v.shape[1:])
                            zero_ctx = jnp.tile(g[0], (1, num_refs, 1))
                            ref_ctx = (g[1:].transpose(1, 0, 2, 3)
                                       .reshape((b, num_refs * v.shape[1],
                                                 v.shape[2])))
                            return jnp.concatenate(
                                [zero_ctx, ref_ctx, ref_ctx], axis=0)
                        return {k: expand(v) for k, v in raw.items()}

                    # auto-regressive: per-ref noise levels; zero rows
                    # differ per ref, dedup only the duplicated cond row
                    noisy_zero = S.add_noise(sched,
                                             jnp.broadcast_to(
                                                 zero_latents[None],
                                                 ref_latents.shape),
                                             noise[None], ref_ts)
                    # deduplicated CFG rows per ref: [zero, ref]
                    pair = jnp.concatenate([noisy_zero, noisy_refs],
                                           axis=1)  # (N, 2B, h, w, 4)
                    pair_flat = pair.reshape((num_refs * 2 * b,)
                                             + pair.shape[2:])
                    t_flat = jnp.repeat(ref_ts, 2 * b)
                    # ONE batched reference pass for all refs (vs the
                    # reference's serial per-ref forwards)
                    _, raw = unet_apply(pair_flat, t_flat, prev2_flat)

                    # (N*2B, S, C) -> (2B, N*S, C) -> expand to the 3-row
                    # CFG layout [zero, ref, ref] (pipeline.py:440-443)
                    def expand(v):
                        v = (v.reshape((num_refs, 2 * b) + v.shape[1:])
                              .transpose(1, 0, 2, 3)
                              .reshape((2 * b, num_refs * v.shape[1],
                                        v.shape[2])))
                        return jnp.concatenate([v, v[b:]], axis=0)
                    return {k: expand(v) for k, v in raw.items()}

                cached_ctx = carry[2]
                if ref_feature_interval > 1:
                    ctx = jax.lax.cond(
                        i % ref_feature_interval == 0,
                        compute_ctx, lambda _: cached_ctx, None)
                else:
                    ctx = compute_ctx(None)
                lat_in = jnp.concatenate([model_lat] * 3, axis=0)
                eps3, _ = unet_apply(lat_in, t, text3, ctx)
                eps_uncond, eps_img, eps_all = jnp.split(eps3, 3, axis=0)
                # 3-way CFG (pipeline.py:456-458)
                eps = (eps_uncond
                       + image_guidance_scale * (eps_img - eps_uncond)
                       + guidance_scale * (eps_all - eps_img))
            else:
                lat_in = jnp.concatenate([model_lat] * 2, axis=0)
                eps2, _ = unet_apply(lat_in, t, text2)
                eps_uncond, eps_cond = jnp.split(eps2, 2, axis=0)
                eps = eps_uncond + guidance_scale * (eps_cond - eps_uncond)

            eps = eps.astype(jnp.float32)
            if sampler == "dpm++":
                new_latents, dpm_state2 = D.dpmpp_2m_step(
                    sched, eps, t, prev_t, latents, dpm_state)
            elif sampler == "pndm":
                new_latents, dpm_state2 = P.plms_step(
                    sched, eps, i, tcoeff_arr[i], prev_t, latents,
                    dpm_state)
            elif sampler == "lms":
                new_latents, dpm_state2 = L.lms_step(
                    eps, i, coeff_arr[i], latents, dpm_state)
            elif sampler == "euler":
                new_latents = E.euler_step(sched, eps, t, prev_t, latents)
                dpm_state2 = dpm_state
            elif sampler == "euler_a":
                step_noise = jax.random.normal(
                    jax.random.fold_in(sample_rng, i), latents.shape,
                    jnp.float32)
                new_latents = E.euler_ancestral_step(
                    sched, eps, t, prev_t, latents, step_noise)
                dpm_state2 = dpm_state
            else:
                step_noise = None
                if eta > 0.0:
                    step_noise = jax.random.normal(
                        jax.random.fold_in(sample_rng, i), latents.shape,
                        jnp.float32)
                new_latents = S.ddim_step(sched, eps, t, prev_t, latents,
                                          eta=eta, noise=step_noise)
                dpm_state2 = dpm_state
            new_cached = ctx if (use_refs and ref_feature_interval > 1) \
                else carry[2]
            return (new_latents, dpm_state2, new_cached)

        if use_refs and ref_feature_interval > 1:
            # zero-filled cache with the exact context structure, derived
            # by abstract evaluation of one reference pass; the first step
            # (i=0) always recomputes, so the zeros are never consumed
            def _ctx_struct():
                ref_ts = _ref_timesteps(stage, t_arr[0] // 10, num_refs)
                noisy = S.add_noise(sched, ref_latents, noise[None], ref_ts)
                pair = jnp.concatenate([noisy, noisy], axis=1)
                pair_flat = pair.reshape((num_refs * 2 * b,)
                                         + pair.shape[2:])
                t_flat = jnp.repeat(ref_ts, 2 * b)
                _, raw = self.unet.apply(params["unet"], pair_flat, t_flat,
                                         prev2_flat)
                return {
                    k: (v.reshape((num_refs, 2 * b) + v.shape[1:])
                         .transpose(1, 0, 2, 3)
                         .reshape((2 * b, num_refs * v.shape[1],
                                   v.shape[2])))
                    for k, v in raw.items()}

            struct = jax.eval_shape(_ctx_struct)
            init_ctx = {k: jnp.zeros((3 * b,) + v.shape[1:], v.dtype)
                        for k, v in struct.items()}
        else:
            init_ctx = 0  # placeholder carry slot
        if is_euler:
            # incoming latents are unit-variance (init_noise_sigma=1 for
            # the DDIM-family schedule); lift into sigma space
            latents = (latents / self.schedule.init_noise_sigma
                       * E.sigma_of(sched, t_arr[0]))
        elif sampler == "lms":
            latents = (latents / self.schedule.init_noise_sigma
                       * sigma_arr[0])
        if sampler == "pndm":
            samp_state = P.init_state(latents)
        elif sampler == "lms":
            samp_state = L.init_state(latents)
        else:
            samp_state = D.init_state(latents)
        final, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (latents, samp_state, init_ctx))
        return final

    @functools.partial(jax.jit, static_argnums=(0,))
    def decode(self, vae_params, latents: jax.Array) -> jax.Array:
        """Latents -> images in [0,1] (pipeline.py:198-205)."""
        img = self.vae.apply(vae_params,
                             latents / self.vae.config.scaling_factor,
                             method=self.vae.decode)
        return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    # ----------------------------------------------------------- story
    @functools.partial(jax.jit, static_argnums=(0,),
                       static_argnames=("num_inference_steps", "max_refs",
                                        "sampler", "eta",
                                        "ref_feature_interval",
                                        "normalize_refs", "height",
                                        "width"))
    def story_rollout(self, params: Dict[str, Params],
                      text_uncond: jax.Array, text_conds: jax.Array,
                      rng: jax.Array, guidance_scale: jax.Array,
                      image_guidance_scale: jax.Array,
                      first_frame: Optional[jax.Array] = None,
                      first_caption_emb: Optional[jax.Array] = None, *,
                      num_inference_steps: int = 50, max_refs: int = 3,
                      sampler: str = "ddim", eta: float = 0.0,
                      ref_feature_interval: int = 1,
                      normalize_refs: bool = False,
                      height: int = 512, width: int = 512) -> jax.Array:
        """The FULL autoregressive story as ONE jitted program.

        Equivalent to generate_story's per-frame pipeline calls (frame 1
        via stage='no', frame k conditioned on up to `max_refs` previous
        frames; the paper's usage of inference.py:103-115) but fused into
        a single dispatch, with two tail optimizations:

        - one launch per STORY instead of one per frame — the per-frame
          dispatch latency (O(100 ms) through a remote-chip tunnel)
          disappears from the rollout's critical path;
        - each generated frame's pixels run the VAE ENCODER exactly once:
          the posterior MOMENTS are cached and re-sampled with that
          frame's key whenever the frame serves as a reference (the
          unfused rollout re-encodes the same pixels at up to `max_refs`
          subsequent frames). The encoder is deterministic, so caching
          moments is exact.

        Numerics: same algorithm and key discipline as the unfused path
        (frame 0 of a 2-step tiny rollout reproduces it bitwise), but
        XLA fuses across the frame boundary (decode epilogue into the
        next frame's encoder prologue), reordering elementwise float32
        math — feedback frames match the per-frame rollout to roundoff
        (observed <= ~1e-6 abs in [0, 1] pixels; pinned at 2e-5 by
        tests/test_pipeline.py).

        Args:
          text_uncond: (B, 77, 768) empty-prompt embedding.
          text_conds: (F, B, 77, 768) one caption embedding per frame.
          rng: base key; frame k uses fold_in(rng, k), split exactly as
            _generate does (k_lat, k_ref, k_zero, k_noise, k_eta).
          first_frame: optional (B, H, W, 3) conditioning image in [0, 1]
            (GT opening frame) with `first_caption_emb` (B, 77, 768).
          normalize_refs: feed history frames to the VAE in [-1, 1]
            instead of the reference-checkpoint [0, 1] convention.
        Returns (F, B, H, W, 3) story frames in [0, 1].

        Compile note: the program inlines F sampler loops (one per
        distinct ref count) — the first compile is long; it is cached in
        the persistent compilation cache like every other program here.
        """
        from storygen_tpu.models.vae import DiagonalGaussian
        b = text_uncond.shape[0]
        num_frames = int(text_conds.shape[0])
        h_lat, w_lat = height // 8, width // 8
        sf = self.vae.config.scaling_factor

        def enc_moments(img):
            x = img * 2.0 - 1.0 if normalize_refs else img
            return self.vae.apply(params["vae"], x.astype(jnp.float32),
                                  method=self.vae.encode)

        # the zero-image (CFG uncond ref) moments are frame-invariant:
        # encode once, sample per frame with that frame's k_zero —
        # bitwise-identical to _generate's per-frame zero encode
        zero_dist = self.vae.apply(
            params["vae"], jnp.zeros((b, height, width, 3), jnp.float32),
            method=self.vae.encode)

        hist_m: List[Any] = []
        hist_c: List[jax.Array] = []
        if first_frame is not None:
            hist_m.append(enc_moments(first_frame))
            hist_c.append(first_caption_emb)

        frames = []
        for k in range(num_frames):
            fk = jax.random.fold_in(rng, k)
            k_lat, k_ref, k_zero, k_noise, k_eta = jax.random.split(fk, 5)
            lat0 = jax.random.normal(
                k_lat, (b, h_lat, w_lat, 4),
                jnp.float32) * self.schedule.init_noise_sigma
            noise = jax.random.normal(k_noise, (b, h_lat, w_lat, 4),
                                      jnp.float32)
            n = min(len(hist_m), max_refs)
            if n == 0:
                lat = self.sample(
                    params, lat0, text_uncond, text_conds[k], None, None,
                    None, None, noise, guidance_scale,
                    image_guidance_scale, stage="no",
                    num_inference_steps=num_inference_steps,
                    sampler=sampler, eta=eta, sample_rng=k_eta)
            else:
                # one posterior draw over the flat (n*B, h, w, 4) stack —
                # the same shape and key encode_ref_latents uses, so the
                # draw is bitwise-identical to the unfused path's
                dists = hist_m[-n:]
                flat = DiagonalGaussian(
                    jnp.concatenate([d.mean for d in dists], axis=0),
                    jnp.concatenate([d.logvar for d in dists], axis=0))
                refs = (flat.sample(k_ref) * sf).reshape(
                    (n, b, h_lat, w_lat, 4))
                zero_lat = zero_dist.sample(k_zero) * sf
                prev_c = jnp.stack(hist_c[-n:])
                prev_u = jnp.broadcast_to(text_uncond[None],
                                          (n,) + text_uncond.shape)
                lat = self.sample(
                    params, lat0, text_uncond, text_conds[k], refs,
                    zero_lat, prev_u, prev_c, noise, guidance_scale,
                    image_guidance_scale, stage="auto-regressive",
                    num_inference_steps=num_inference_steps,
                    sampler=sampler, eta=eta, sample_rng=k_eta,
                    ref_feature_interval=ref_feature_interval)
            img = self.decode(params["vae"], lat)
            frames.append(img)
            if k + 1 < num_frames:  # the last frame is never a ref
                hist_m.append(enc_moments(img))
                hist_c.append(text_conds[k])
        return jnp.stack(frames)


class StoryGenPipeline:
    """End-to-end host-facing pipeline (tokenize -> sample -> decode).

    Mirrors the reference pipeline's __call__ signature semantics
    (model/pipeline.py:273-294): stage, prompt, image_prompt (reference
    frames), prev_prompt (their captions), guidance scales, steps.
    """

    def __init__(self, unet, unet_params, vae, vae_params, text_encoder,
                 text_params, tokenizer,
                 sched_cfg: SchedulerConfig = SchedulerConfig()):
        self.sampler = StoryGenSampler(unet, vae, sched_cfg)
        self.params = {"unet": unet_params, "vae": vae_params}
        self.vae = vae
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.tokenizer = tokenizer
        # params must be a traced ARGUMENT, not a closure constant: baked
        # constants are inlined into the HLO, and the ~500 MB payload
        # breaks remote compilation (HTTP 413) the first time the text
        # encoder runs on a tunneled TPU.
        apply = jax.jit(text_encoder.apply)
        self._encode_text = lambda ids: apply(self.text_params, ids)

    def save_pretrained(self, root: str) -> None:
        """Export all components in the diffusers folder layout the
        reference stack loads (pipeline.save_pretrained parity,
        train_StorySalon_stage2.py:348-357): unet/ vae/ text_encoder/
        tokenizer/ scheduler/ + model_index.json."""
        from storygen_tpu.checkpoint.hf_export import save_pretrained
        save_pretrained(root, unet_params=self.params["unet"],
                        vae_params=self.params["vae"],
                        clip_params=self.text_params,
                        configs={"unet": self.sampler.unet.config,
                                 "vae": self.vae.config,
                                 "clip": self.text_encoder.config},
                        scheduler_config=self.sampler.sched_cfg)
        tok = getattr(self.tokenizer, "tok", self.tokenizer)
        if hasattr(tok, "save_pretrained"):
            tok.save_pretrained(f"{root}/tokenizer")

    def tokenize(self, prompts: Sequence[str]) -> jax.Array:
        """Accepts either a data.loader.Tokenizer-style callable
        (list[str] -> (B, 77) ids) or a raw HF tokenizer."""
        try:
            ids = self.tokenizer(list(prompts))
            if isinstance(ids, dict) or hasattr(ids, "input_ids"):
                ids = ids["input_ids"]
        except TypeError:
            ids = self.tokenizer(list(prompts), padding="max_length",
                                 max_length=77, truncation=True,
                                 return_tensors="np")["input_ids"]
        return jnp.asarray(ids, dtype=jnp.int32)

    def encode_prompt(self, prompts: Sequence[str]) -> jax.Array:
        """(B,) strings -> (B, 77, 768), reference _encode_prompt
        conditional half (pipeline.py:108-138)."""
        return self._encode_text(self.tokenize(prompts))

    def __call__(self, stage: str, prompt: Sequence[str],
                 image_prompt: Optional[np.ndarray] = None,
                 prev_prompt: Optional[Sequence[Sequence[str]]] = None,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.5,
                 image_guidance_scale: float = 3.5,
                 negative_prompt: Optional[Sequence[str]] = None,
                 rng: Optional[jax.Array] = None,
                 latents: Optional[jax.Array] = None,
                 sampler: str = "ddim",
                 eta: float = 0.0,
                 ref_feature_interval: int = 1,
                 num_images_per_prompt: int = 1) -> np.ndarray:
        """Generate images.

        Args:
          stage: 'no' | 'multi-image-condition' | 'auto-regressive'.
          prompt: B target captions.
          image_prompt: (N, B, H, W, 3) reference frames, fed to the VAE
            AS-IS (NHWC; the reference uses (B, N, 3, H, W) NCHW). The
            reference-checkpoint convention is refs in [0, 1]: the
            reference's normalize loop is a no-op (inference.py:89-91,
            dataset.py:299-301 rebind the loop variable), so published
            checkpoints were trained with refs in [0, 1] while targets
            were in [-1, 1]. Pass [-1, 1] refs only for checkpoints
            trained with `normalize_refs=True` data.
          prev_prompt: N lists of B captions for the reference frames.
          sampler: 'ddim' (reference parity) | 'dpm++' (25 steps ~
            DDIM-50 quality) | 'pndm' (the SD-1.5 scheduler_config
            class) | 'lms' | 'euler' | 'euler_a'.
          eta: DDIM stochasticity (reference eta kwarg,
            model/pipeline.py:287); noise drawn from `rng`.
          ref_feature_interval: recompute VLCM reference features every
            k-th step (1 = exact reference parity; 2 ~ 1.45x faster at
            minor drift — BENCH.md "Opt-in accelerations").
          num_images_per_prompt: generate this many samples per prompt in
            ONE batched sampler call (reference _encode_prompt duplication,
            model/pipeline.py:87-196; used with 10 samples/prompt by
            inference_COCO_val.py:120). Samples for prompt i occupy rows
            [i*n, (i+1)*n) of the output.
        Returns (B * num_images_per_prompt, H, W, 3) floats in [0, 1].
        """
        images, _ = self._generate(
            stage, prompt, image_prompt=image_prompt,
            prev_prompt=prev_prompt, height=height, width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            image_guidance_scale=image_guidance_scale,
            negative_prompt=negative_prompt, rng=rng, latents=latents,
            sampler=sampler, eta=eta,
            ref_feature_interval=ref_feature_interval,
            num_images_per_prompt=num_images_per_prompt)
        return images

    def _generate(self, stage: str, prompt: Sequence[str],
                  image_prompt: Optional[np.ndarray] = None,
                  prev_prompt: Optional[Sequence[Sequence[str]]] = None,
                  height: int = 512, width: int = 512,
                  num_inference_steps: int = 50,
                  guidance_scale: float = 7.5,
                  image_guidance_scale: float = 3.5,
                  negative_prompt: Optional[Sequence[str]] = None,
                  rng: Optional[jax.Array] = None,
                  latents: Optional[jax.Array] = None,
                  sampler: str = "ddim",
                  eta: float = 0.0,
                  ref_feature_interval: int = 1,
                  num_images_per_prompt: int = 1,
                  ref_latents: Optional[jax.Array] = None):
        """__call__'s engine; returns (images, final_latents).

        `ref_latents`: optional (N, B, H/8, W/8, 4) pre-encoded,
        0.18215-scaled reference latents. When given, the VAE encode of
        `image_prompt` is skipped and `image_prompt` may be None
        (generate_story(reuse_latents=True) feeds each frame's final
        latents straight back in — the returned final latents are in the
        same scaled convention).
        """
        if stage not in STAGES:
            raise ValueError(f"stage must be one of {STAGES}")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        b = len(prompt)
        n = int(num_images_per_prompt)
        bn = b * n
        h_lat, w_lat = height // 8, width // 8

        def dup(x, axis=0):
            """Duplicate the per-prompt batch axis n times (prompt-major),
            matching the reference's embedding duplication."""
            return x if n == 1 else jnp.repeat(x, n, axis=axis)

        k_lat, k_ref, k_zero, k_noise, k_eta = jax.random.split(rng, 5)
        if latents is None:
            latents = jax.random.normal(k_lat, (bn, h_lat, w_lat, 4),
                                        jnp.float32)
        latents = latents * self.sampler.schedule.init_noise_sigma

        uncond = [""] * b if negative_prompt is None else list(negative_prompt)
        text_cond = dup(self.encode_prompt(prompt))
        text_uncond = dup(self.encode_prompt(uncond))

        use_refs = stage in ("multi-image-condition", "auto-regressive")
        zero_latents = prev_u = prev_c = None
        if not use_refs:
            ref_latents = None
        else:
            if prev_prompt is None or (image_prompt is None
                                       and ref_latents is None):
                raise ValueError(f"stage {stage} needs prev_prompt and "
                                 "image_prompt (or ref_latents)")
            if ref_latents is not None:
                ref_latents = dup(jnp.asarray(ref_latents, jnp.float32),
                                  axis=1)
            else:
                imgs = jnp.asarray(image_prompt, dtype=jnp.float32)
                ref_latents = dup(self.sampler.encode_ref_latents(
                    self.params["vae"], imgs, k_ref), axis=1)
            zero_img = jnp.zeros((b, height, width, 3), jnp.float32)
            zdist = self.vae.apply(self.vae_params, zero_img,
                                   method=self.vae.encode)
            zero_latents = dup(zdist.sample(k_zero)
                               * self.vae.config.scaling_factor)
            prev_c = dup(jnp.stack([self.encode_prompt(p)
                                    for p in prev_prompt]), axis=1)
            prev_u = dup(jnp.stack([self.encode_prompt([""] * b)
                                    for _ in prev_prompt]), axis=1)

        noise = jax.random.normal(k_noise, (bn, h_lat, w_lat, 4),
                                  jnp.float32)

        final = self.sampler.sample(
            self.params, latents, text_uncond, text_cond, ref_latents,
            zero_latents, prev_u, prev_c, noise,
            jnp.asarray(guidance_scale, jnp.float32),
            jnp.asarray(image_guidance_scale, jnp.float32),
            stage=stage, num_inference_steps=num_inference_steps,
            sampler=sampler, eta=float(eta), sample_rng=k_eta,
            ref_feature_interval=int(ref_feature_interval))

        images = self.sampler.decode(self.params["vae"], final)
        return np.asarray(images), final

    def generate_story(self, prompts: Sequence[str],
                       first_frame: Optional[np.ndarray] = None,
                       first_caption: Optional[str] = None,
                       max_refs: int = 3, normalize_refs: bool = False,
                       reuse_latents: bool = False, fused: bool = False,
                       **kw) -> List[np.ndarray]:
        """Autoregressive story rollout: generate frame k conditioned on up
        to `max_refs` previous frames and their captions (the paper's usage
        of stage='auto-regressive'; the reference leaves this loop to the
        caller, inference.py:103-115).

        Args:
          prompts: one caption per story frame to generate.
          first_frame: optional (H, W, 3) conditioning image in [0, 1]
            (e.g. a ground-truth opening frame) with `first_caption`.
          normalize_refs: False (default) feeds history frames to the VAE
            in [0, 1] — the reference-checkpoint convention (the
            reference's ref normalize is a no-op, inference.py:89-91, so
            its checkpoints saw [0, 1] refs in training AND inference).
            True rescales to [-1, 1] for checkpoints trained on
            `normalize_refs=True` data (data/datasets.py).
          reuse_latents: True conditions frame k+1 on frame k's FINAL
            LATENTS instead of decode->re-encode'ing its pixels. Skips
            one VAE encode per history ref (~3/frame). Deviation from
            the reference protocol: refs skip the VAE roundtrip (the
            roundtrip acts as a mild denoiser), so conditioning features
            drift slightly from a decode/re-encode chain — an opt-in
            speed knob, not reference parity.
          fused: True runs the whole story as ONE jitted program
            (StoryGenSampler.story_rollout): one dispatch per story, and
            each frame's VAE-encoder pass runs once with its posterior
            moments cached. Same algorithm and rng discipline as the
            default per-frame path; frames match it to float32 roundoff
            (cross-frame fusion reorders elementwise math; ~1e-6 abs).
            First compile is long (persisted in the compilation cache).

        RNG: each frame k runs with `fold_in(rng, k)` (rng defaults to
        PRNGKey(0)) — distinct initial latents and ref-noise draws per
        frame, reproducible under a fixed seed. This matches the
        reference's torch `generator` semantics, whose state ADVANCES
        across the per-frame pipeline calls (model/pipeline.py:253-263;
        generator=None draws fresh noise each call) — reusing one key
        for every frame would start all frames of a story from
        identical noise.
        Returns the generated frames, each (H, W, 3) in [0, 1].
        """
        base_rng = kw.pop("rng", None)
        if base_rng is None:
            base_rng = jax.random.PRNGKey(0)
        if reuse_latents and fused:
            raise ValueError("fused=True implies the exact decode->encode "
                             "feedback chain; reuse_latents is a different "
                             "conditioning semantics — pick one")
        if reuse_latents:
            return self._generate_story_latents(
                prompts, first_frame, first_caption, max_refs,
                normalize_refs, base_rng, **kw)
        if fused:
            return self._generate_story_fused(
                prompts, first_frame, first_caption, max_refs,
                normalize_refs, base_rng, **kw)
        history: List[Tuple[np.ndarray, str]] = []
        if first_frame is not None:
            history.append((np.asarray(first_frame),
                            first_caption or prompts[0]))
        frames: List[np.ndarray] = []
        for k, prompt in enumerate(prompts):
            frame_rng = jax.random.fold_in(base_rng, k)
            if not history:
                img = self(stage="no", prompt=[prompt], rng=frame_rng,
                           **kw)
            else:
                hist = history[-max_refs:]
                refs = np.stack([f for f, _ in hist])[:, None]
                if normalize_refs:
                    refs = refs * 2.0 - 1.0
                img = self(stage="auto-regressive", prompt=[prompt],
                           image_prompt=refs, rng=frame_rng,
                           prev_prompt=[[c] for _, c in hist], **kw)
            frames.append(img[0])
            history.append((img[0], prompt))
        return frames

    def _generate_story_latents(self, prompts, first_frame, first_caption,
                                max_refs, normalize_refs, base_rng,
                                **kw) -> List[np.ndarray]:
        """generate_story(reuse_latents=True): the history is kept as
        scaled latents and fed back via _generate(ref_latents=...).
        Per-frame keys are fold_in(base_rng, k), as in generate_story;
        the optional first-frame encode uses fold_in(base_rng,
        len(prompts)) — outside the frame-index range."""
        history: List[Tuple[jax.Array, str]] = []
        if first_frame is not None:
            frame = np.asarray(first_frame, dtype=np.float32)
            if normalize_refs:
                frame = frame * 2.0 - 1.0
            enc_rng = jax.random.fold_in(base_rng, len(prompts))
            lat0 = self.sampler.encode_ref_latents(
                self.params["vae"], jnp.asarray(frame)[None, None],
                enc_rng)[0, 0]
            history.append((lat0, first_caption or prompts[0]))
        frames: List[np.ndarray] = []
        for k, prompt in enumerate(prompts):
            frame_rng = jax.random.fold_in(base_rng, k)
            if not history:
                img, fin = self._generate(stage="no", prompt=[prompt],
                                          rng=frame_rng, **kw)
            else:
                hist = history[-max_refs:]
                refs = jnp.stack([l for l, _ in hist])[:, None]
                img, fin = self._generate(
                    stage="auto-regressive", prompt=[prompt],
                    ref_latents=refs, rng=frame_rng,
                    prev_prompt=[[c] for _, c in hist], **kw)
            frames.append(img[0])
            history.append((fin[0], prompt))
        return frames

    def _generate_story_fused(self, prompts, first_frame, first_caption,
                              max_refs, normalize_refs, base_rng,
                              height: int = 512, width: int = 512,
                              num_inference_steps: int = 50,
                              guidance_scale: float = 7.5,
                              image_guidance_scale: float = 3.5,
                              sampler: str = "ddim", eta: float = 0.0,
                              ref_feature_interval: int = 1
                              ) -> List[np.ndarray]:
        """generate_story(fused=True): one story_rollout dispatch. Host
        work is tokenize/text-encode only (all prompts known upfront)."""
        text_conds = jnp.stack([self.encode_prompt([p]) for p in prompts])
        text_uncond = self.encode_prompt([""])
        ff = fc = None
        if first_frame is not None:
            ff = jnp.asarray(first_frame, jnp.float32)[None]
            fc = self.encode_prompt([first_caption or prompts[0]])
        out = self.sampler.story_rollout(
            self.params, text_uncond, text_conds, base_rng,
            jnp.asarray(guidance_scale, jnp.float32),
            jnp.asarray(image_guidance_scale, jnp.float32), ff, fc,
            num_inference_steps=num_inference_steps, max_refs=max_refs,
            sampler=sampler, eta=float(eta),
            ref_feature_interval=int(ref_feature_interval),
            normalize_refs=normalize_refs, height=height, width=width)
        out = np.asarray(out)
        return [out[k, 0] for k in range(out.shape[0])]


def numpy_to_pil(images: np.ndarray):
    """(B, H, W, 3) float [0,1] -> list of PIL images
    (reference pipeline.numpy_to_pil parity, model/pipeline.py:486-491)."""
    from PIL import Image
    arr = (np.asarray(images) * 255).round().astype("uint8")
    return [Image.fromarray(a) for a in arr]
