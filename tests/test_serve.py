"""Serving-daemon tests (scripts/serve.py).

The reference has no serving layer (SURVEY.md §1); serve.py is the
framework-completeness extension that turns a checkpoint into an HTTP
service. Tested here with the tiny CPU pipeline: request validation,
story generation through StoryService, and a real HTTP round-trip on an
ephemeral port.
"""
import base64
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.configs import (CLIPTextConfig, UNetConfig, VAEConfig)
from storygen_tpu.models.clip_text import CLIPTextModel
from storygen_tpu.models.unet import UNet2DConditionModel
from storygen_tpu.models.vae import AutoencoderKL
from storygen_tpu.pipeline import StoryGenPipeline

from scripts.serve import StoryService, serve

UNET_SMALL = UNetConfig(block_out_channels=(16, 32, 32, 32),
                        attention_head_dim=4, norm_num_groups=4,
                        cross_attention_dim=24)
VAE_SMALL = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                      norm_num_groups=2, latent_channels=4)


@pytest.fixture(scope="module")
def pipe():
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(config=UNET_SMALL)
    unet_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([0]),
        jnp.zeros((1, 7, 24)))
    vae = AutoencoderKL(config=VAE_SMALL)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    clip = CLIPTextModel(config=CLIPTextConfig(
        vocab_size=64, hidden_size=24, intermediate_size=48,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=7))
    clip_params = jax.jit(clip.init)(rng, jnp.zeros((1, 7), jnp.int32))

    def fake_tok(texts):
        return np.asarray([[hash(t) % 64 for _ in range(7)]
                           for t in texts], np.int32)

    return StoryGenPipeline(unet, unet_params, vae, vae_params,
                            clip, clip_params, fake_tok)


def _decode_png(b64):
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))


def test_service_generates_story(pipe):
    svc = StoryService(pipe)
    out = svc.handle_story({"prompts": ["a fox", "the fox runs"],
                            "num_inference_steps": 2,
                            "height": 64, "width": 64, "seed": 3})
    assert len(out["frames"]) == 2
    img = _decode_png(out["frames"][0])
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert out["latency_s"] >= 0
    # seeded -> reproducible bytes
    out2 = svc.handle_story({"prompts": ["a fox", "the fox runs"],
                             "num_inference_steps": 2,
                             "height": 64, "width": 64, "seed": 3})
    assert out["frames"] == out2["frames"]


def test_service_fused_story_matches_default(pipe):
    """`fused: true` requests route through the single-program rollout
    and return frames equal to the per-frame path up to the PNG quantizer
    (float32-roundoff difference << 1/255)."""
    svc = StoryService(pipe)
    req = {"prompts": ["a fox", "the fox runs"], "num_inference_steps": 2,
           "height": 64, "width": 64, "seed": 3}
    base = svc.handle_story(req)
    fused = svc.handle_story({**req, "fused": True})
    assert len(fused["frames"]) == 2
    for a, b in zip(base["frames"], fused["frames"]):
        ia, ib = _decode_png(a).astype(int), _decode_png(b).astype(int)
        assert np.abs(ia - ib).max() <= 1


def test_service_rejects_bad_requests(pipe):
    svc = StoryService(pipe)
    with pytest.raises(ValueError, match="unknown fields"):
        svc.handle_story({"prompts": ["a"], "steps": 2})
    for bad in ({}, {"prompts": []}, {"prompts": "a"}, {"prompts": [1]}):
        with pytest.raises(ValueError, match="prompts"):
            svc.handle_story(bad)


def test_http_round_trip(pipe):
    srv = serve(pipe, "127.0.0.1", 0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] is True and health["devices"] >= 1

        body = json.dumps({"prompts": ["a fox"], "num_inference_steps": 2,
                           "height": 64, "width": 64, "seed": 0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/story", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["frames"]) == 1
        assert _decode_png(out["frames"][0]).shape == (64, 64, 3)

        # validation errors surface as 400, not 500/connection drops
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/story",
            data=json.dumps({"prompts": []}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=30)
        assert ei.value.code == 404
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_service_with_tp_sharded_params():
    """scripts/serve.py --tp path: UNet params sharded over a
    (data, tensor) mesh still serve a story (GSPMD handles the sampler's
    jitted fori_loop transparently; VERDICT r3 #7 serving wiring).
    Channel widths must divide the tensor axis, so this uses the
    TP-compatible small config rather than the module fixture."""
    from storygen_tpu.parallel import tensor as T
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(config=UNetConfig(
        block_out_channels=(32, 64, 64, 64), attention_head_dim=4,
        norm_num_groups=4, cross_attention_dim=24))
    unet_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([0]),
        jnp.zeros((1, 7, 24)))
    vae = AutoencoderKL(config=VAE_SMALL)
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
    clip = CLIPTextModel(config=CLIPTextConfig(
        vocab_size=64, hidden_size=24, intermediate_size=48,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=7))
    clip_params = jax.jit(clip.init)(rng, jnp.zeros((1, 7), jnp.int32))

    mesh = T.make_tp_mesh(2, 4)
    unet_tp = T.shard_unet_params(unet_params, mesh)
    vae_r, clip_r = T.replicated_on(mesh, (vae_params, clip_params))

    def fake_tok(texts):
        return np.asarray([[hash(t) % 64 for _ in range(7)]
                           for t in texts], np.int32)

    pipe_tp = StoryGenPipeline(unet, unet_tp, vae, vae_r, clip, clip_r,
                               fake_tok)
    svc = StoryService(pipe_tp)
    out = svc.handle_story({"prompts": ["a fox", "a lantern"],
                            "num_inference_steps": 2, "height": 64,
                            "width": 64, "seed": 3})
    assert len(out["frames"]) == 2
    img = _decode_png(out["frames"][0])
    assert img.shape == (64, 64, 3)
