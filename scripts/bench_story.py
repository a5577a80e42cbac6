"""p50 per-story (4-frame) latency — the second BASELINE.md north-star
metric (frames/s/chip being the first, bench.py).

A story is the paper's auto-regressive rollout (reference leaves it to
the caller, inference.py:103-115): frame 1 via stage='no', frames 2-4
via stage='auto-regressive' conditioned on the 1/2/3 previous frames.
Everything stays ON DEVICE between frames: each frame program decodes to
[0,1] pixels, and the next frame's program VAE-encodes those pixels as
its reference latents (the reference-checkpoint [0,1] convention,
data/datasets.py) — no host roundtrip inside a story, so the number is
free of the sandbox tunnel's O(100 ms) dispatch artifacts (BENCH.md
"timing methodology").

One jitted program per ref count (0..3 — static shapes, 4 compiles,
cached in .jax_cache). Stories are timed with DISTINCT chained inputs
(the tunnel elides repeated identical launches).

Prints one JSON line: {"metric": "story_p50_latency_4frame...", ...}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from storygen_tpu.configs import UNetConfig, VAEConfig
    from storygen_tpu.models.unet import UNet2DConditionModel
    from storygen_tpu.models.vae import AutoencoderKL
    from storygen_tpu.pipeline import StoryGenSampler

    rng = jax.random.PRNGKey(0)
    b, steps, hw, px = 1, 50, 64, 512

    unet = UNet2DConditionModel(config=UNetConfig(), dtype=jnp.bfloat16)
    unet_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray([0]),
        jnp.zeros((1, 77, 768)))
    vae = AutoencoderKL(config=VAEConfig(), dtype=jnp.bfloat16)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          {"unet": unet_params, "vae": vae_params})

    sampler = StoryGenSampler(unet, vae)
    ks = jax.random.split(rng, 8)
    text_u = jax.random.normal(ks[1], (b, 77, 768), jnp.float32) * 0.02
    zero = jax.random.normal(ks[4], (b, hw, hw, 4), jnp.float32) * 0.01
    noise = jax.random.normal(ks[7], (b, hw, hw, 4), jnp.float32)

    # --reuse-latents / STORY_REUSE_LATENTS=1: feed each frame's final
    # latents forward instead of decode->re-encode
    # (pipeline.generate_story(reuse_latents=True) — speed knob, not
    # reference parity). Skips n_refs VAE encodes per frame.
    reuse = ("--reuse-latents" in sys.argv
             or os.environ.get("STORY_REUSE_LATENTS", "0") == "1")
    # --fused / STORY_FUSED=1: the whole 4-frame story as ONE jitted
    # program (StoryGenSampler.story_rollout): one dispatch per story
    # and one VAE-encoder pass per generated frame (posterior moments
    # cached) — same algorithm as the per-frame rollout, equal to
    # float32 roundoff (cross-frame fusion; tests/test_pipeline.py).
    fused = ("--fused" in sys.argv
             or os.environ.get("STORY_FUSED", "0") == "1")

    def make_frame_fn(n_refs: int):
        @jax.jit
        def frame(params, lat0, salt, text_c, prev_u, prev_c, hist):
            # hist: previous frames as (n_refs, B, px, px, 3) pixels in
            # [0,1] (encoded in-program: the story's decode->encode
            # feedback happens entirely on device), or as
            # (n_refs, B, hw, hw, 4) scaled latents in reuse mode
            lat0 = lat0 + salt.astype(jnp.float32) * 1e-6
            if n_refs == 0:
                lat = sampler.sample(
                    params, lat0, text_u, text_c, None, None, None, None,
                    noise, jnp.asarray(7.0), jnp.asarray(3.5),
                    stage="no", num_inference_steps=steps)
            else:
                refs = hist if reuse else sampler.encode_ref_latents(
                    params["vae"], hist, jax.random.PRNGKey(1))
                lat = sampler.sample(
                    params, lat0, text_u, text_c, refs, zero,
                    prev_u, prev_c, noise, jnp.asarray(7.0),
                    jnp.asarray(3.5), stage="auto-regressive",
                    num_inference_steps=steps)
            img = sampler.decode(params["vae"], lat)   # (B, px, px, 3)
            return img, lat, img.mean()
        return frame

    frame_fns = [make_frame_fn(n) for n in range(4)]

    def run_story_fused(story_key, salt):
        lks = jax.random.split(story_key, 4)
        text_cs = jnp.stack(
            [jax.random.normal(k2, (b, 77, 768), jnp.float32) * 0.02
             for k2 in lks])
        # salt chains each story through the previous one's output so the
        # tunnel cannot elide repeated identical launches
        text_cs = text_cs + salt.astype(jnp.float32) * 1e-6
        out = sampler.story_rollout(
            params, text_u, text_cs, story_key, jnp.asarray(7.0),
            jnp.asarray(3.5), num_inference_steps=steps)
        return out.mean()

    def run_story(story_key, salt):
        if fused:
            return run_story_fused(story_key, salt)
        lks = jax.random.split(story_key, 8)
        lat0s = [jax.random.normal(k, (b, hw, hw, 4), jnp.float32)
                 for k in lks[:4]]
        text_cs = [jax.random.normal(k, (b, 77, 768), jnp.float32) * 0.02
                   for k in lks[4:]]
        hist = []
        for fi in range(4):
            n = min(fi, 3)
            if n:
                h = jnp.stack(hist[-n:])       # (n,B,px,px,3) | (n,B,hw,hw,4)
                pu = jnp.stack([text_u] * n)
                pc = jnp.stack(text_cs[:n])
            else:
                h = (jnp.zeros((1, b, hw, hw, 4), jnp.float32) if reuse
                     else jnp.zeros((1, b, px, px, 3), jnp.float32))
                pu = pc = jnp.zeros((1, b, 77, 768), jnp.float32)
            img, lat, salt = frame_fns[n](params, lat0s[fi], salt,
                                          text_cs[fi], pu, pc, h)
            hist.append(lat if reuse else img)
        return salt

    # warmup / compile all four programs
    t0 = time.perf_counter()
    salt = run_story(jax.random.PRNGKey(99), jnp.float32(0.0))
    jax.device_get(salt)
    print(f"warmup (incl. compiles): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # STORY_BENCH_GATE=<path>: hold AFTER compile/warmup until the gate
    # file appears. Lets the minutes-long compile overlap other chip work
    # while the TIMED stories still run on an idle chip (shared-chip
    # timings are meaningless).
    gate = os.environ.get("STORY_BENCH_GATE")
    if gate:
        print(f"warm; waiting for gate file {gate}", file=sys.stderr)
        while not os.path.exists(gate):
            time.sleep(5)
        print("gate open; timing", file=sys.stderr)

    n_stories = 3
    times = []
    for i in range(n_stories):
        t0 = time.perf_counter()
        salt = run_story(jax.random.PRNGKey(i), salt)
        jax.device_get(salt)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    print(json.dumps({
        "metric": "story_p50_latency_4frame_512px_ddim50"
                  + ("_reuse_latents" if reuse else "")
                  + ("_fused" if fused else ""),
        "value": round(p50, 3),
        "unit": "s/story",
        "all_times": [round(t, 3) for t in times],
        "frames_per_sec_equiv": round(4.0 / p50, 4),
    }))


if __name__ == "__main__":
    main()
