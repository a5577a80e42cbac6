"""Headline benchmark: frames/sec/chip, 512px 50-step DDIM story frame.

Measures the flagship StoryGen operating point (BASELINE.md): one
auto-regressive story frame at 512x512, DDIM-50, 3-way CFG, 3 reference
frames through the VLCM — i.e. per denoise step one batched reference-cycle
UNet pass (batch 3B*3) plus one main pass (batch 3B) — in bf16 on a single
chip, everything inside one jitted fori_loop.

vs_baseline: the reference publishes no numbers (BASELINE.md). The ratio
reported here is against an *estimated* A100 PyTorch fp16+xformers figure
for the same workload: SD-1.5 UNet batch-2 CFG step ~= 30 ms on A100 =>
StoryGen step (12 batch-1-equivalent UNet forwards) ~= 180 ms => ~9 s per
frame => 0.11 frames/s. Update when a measured reference number exists.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_EST_FRAMES_PER_SEC = 0.11

def _wait_for_tpu(max_tries: int = None, sleep_s: float = 60.0):
    """The axon tunnel has transient outages (observed: backend init
    raising UNAVAILABLE, or hanging — multi-HOUR on 2026-08-17). Probe
    jax.devices() in a subprocess with a hard timeout and retry so an
    outage at bench time doesn't cost the round's headline number: the
    default budget is ~2.7 h (40 tries x 4 min), BENCH_TPU_TRIES
    overrides. Returns silently on success; raises after max_tries."""
    if max_tries is None:
        max_tries = int(os.environ.get("BENCH_TPU_TRIES", "40"))
    import subprocess
    last = ""
    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=180)
            if r.returncode == 0:
                return
            last = (r.stderr or b"").decode()[-300:]
        except subprocess.TimeoutExpired:
            last = "probe timed out (tunnel hang)"
        print(f"# TPU probe {i + 1}/{max_tries} failed: {last!r}; "
              f"retrying in {sleep_s:.0f}s", file=sys.stderr)
        time.sleep(sleep_s)
    raise RuntimeError(f"TPU backend unavailable after {max_tries} probes: "
                       f"{last}")


def main():
    _wait_for_tpu()
    import jax
    import jax.numpy as jnp
    # persistent compile cache: the 50-step loop is one big XLA program;
    # cache it across bench invocations
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from storygen_tpu.configs import UNetConfig, VAEConfig
    from storygen_tpu.models.unet import UNet2DConditionModel
    from storygen_tpu.models.vae import AutoencoderKL
    from storygen_tpu.pipeline import StoryGenSampler

    rng = jax.random.PRNGKey(0)
    b = int(os.environ.get("BENCH_BATCH", "1"))
    n_refs, steps = 3, 50
    hw = 64  # 512px latents

    unet = UNet2DConditionModel(config=UNetConfig(), dtype=jnp.bfloat16)
    unet_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.asarray([0]),
        jnp.zeros((1, 77, 768)))
    vae = AutoencoderKL(config=VAEConfig(), dtype=jnp.bfloat16)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    # store params in bf16: halves weight HBM traffic per forward (serving
    # config; training keeps fp32 master weights)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          {"unet": unet_params, "vae": vae_params})

    sampler = StoryGenSampler(unet, vae)
    ks = jax.random.split(rng, 8)
    latents = jax.random.normal(ks[0], (b, hw, hw, 4), jnp.float32)
    text_u = jax.random.normal(ks[1], (b, 77, 768), jnp.float32) * 0.02
    text_c = jax.random.normal(ks[2], (b, 77, 768), jnp.float32) * 0.02
    refs = jax.random.normal(ks[3], (n_refs, b, hw, hw, 4), jnp.float32)
    zero = jax.random.normal(ks[4], (b, hw, hw, 4), jnp.float32) * 0.01
    prev_u = jax.random.normal(ks[5], (n_refs, b, 77, 768), jnp.float32) * 0.02
    prev_c = jax.random.normal(ks[6], (n_refs, b, 77, 768), jnp.float32) * 0.02
    noise = jax.random.normal(ks[7], (b, hw, hw, 4), jnp.float32)

    @jax.jit
    def run(params, base, salt, nz):
        # ONE dispatch per frame: chain-perturb + sample + decode +
        # reduce in a single jitted program (params as traced arguments —
        # closure constants would inline the weights into the HLO and
        # break tunneled remote compilation). The tunneled chip has
        # O(100 ms) per-dispatch latency, which at 3 dispatches/frame was
        # ~7% of frame time; the decode itself is ~21 ms on device.
        lat0 = base + salt.astype(jnp.float32) * 1e-6
        lat = sampler.sample(params, lat0, text_u, text_c, refs, zero,
                             prev_u, prev_c, nz, jnp.asarray(7.0),
                             jnp.asarray(3.5), stage="auto-regressive",
                             num_inference_steps=steps)
        img = sampler.decode(params["vae"], lat)
        return img, img.mean()

    # Each timed iteration gets DISTINCT inputs, chained through the
    # previous output: the serving tunnel elides repeated identical
    # launches, so timing the same call N times measures nothing.
    n_iters = 3
    iter_keys = jax.random.split(jax.random.PRNGKey(42), n_iters + 1)
    lat_list = [jax.random.normal(k, (b, hw, hw, 4), jnp.float32)
                for k in iter_keys]

    # warmup / compile. If the warmup dies (e.g. a Pallas kernel the chip's
    # Mosaic rejects even though interpret-mode tests pass), re-exec once
    # without the halo conv kernels rather than losing the headline run.
    try:
        _, m = run(params, lat_list[-1], jnp.float32(0.0), noise)
        jax.device_get(m)
    except Exception as e:
        if os.environ.get("STORYGEN_HALO_CONV", "1") != "0":
            reason = f"{type(e).__name__}: {e}"[:300]
            print(f"# warmup failed ({reason}); retrying "
                  f"with STORYGEN_HALO_CONV=0", file=sys.stderr)
            os.environ["STORYGEN_HALO_CONV"] = "0"
            # surfaced in the output JSON so the artifact itself records
            # that the halo kernels were disabled (ADVICE r3)
            os.environ["STORYGEN_BENCH_FALLBACK_REASON"] = reason
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise

    t0 = time.perf_counter()
    for i in range(n_iters):
        _, m = run(params, lat_list[i], m, noise)
    jax.device_get(m)
    dt = (time.perf_counter() - t0) / n_iters

    frames_per_sec = b / dt
    out = {
        "metric": "frames_per_sec_per_chip_512px_ddim50_autoregressive_3ref",
        "value": round(frames_per_sec, 4),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / A100_EST_FRAMES_PER_SEC, 3),
        # whether the Pallas halo conv kernels were live in THIS run —
        # false means the warmup re-exec'd with STORYGEN_HALO_CONV=0 (or
        # the env disabled them) and the number excludes those kernels
        "halo_conv_active": os.environ.get("STORYGEN_HALO_CONV", "1") != "0",
    }
    if os.environ.get("STORYGEN_BENCH_FALLBACK_REASON"):
        out["fallback_reason"] = os.environ["STORYGEN_BENCH_FALLBACK_REASON"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
