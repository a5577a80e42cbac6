"""Weights-gated golden: bit-level import parity against REAL SD-1.5.

This sandbox is zero-egress, so the reference checkpoint folder
(/root/reference/ckpt/stable-diffusion-v1-5) ships configs but no weight
tensors — these tests AUTO-SKIP here. The moment a real
`diffusion_pytorch_model.bin` / `pytorch_model.bin` appears (either in
the reference folder or wherever STORYGEN_SD15_WEIGHTS points), they pin:

- UNet: torch->flax import (incl. the attn3<-attn1 surgery of
  model/unet_2d_condition.py:487-510) vs the independent plain-torch
  mirror (tests/torch_mirror.py) re-executing the reference composed math
  on the SAME real weights.
- VAE: flax decode vs the mirror's vae_decode.
- CLIP text: flax encoder vs transformers' CLIPTextModel (installed).

Protocol anchor: /root/reference/model/unet_2d_condition.py:487-510
(load_SDM_state_dict), inference.py:44-48 (from_pretrained subfolders).
"""
import os

import numpy as np
import pytest

SD15 = os.environ.get("STORYGEN_SD15_WEIGHTS",
                      "/root/reference/ckpt/stable-diffusion-v1-5")

pytestmark = pytest.mark.slow


def _weight_file(subfolder):
    from storygen_tpu.checkpoint.hf_import import find_weight_file
    try:
        return find_weight_file(os.path.join(SD15, subfolder))
    except (FileNotFoundError, OSError):
        return None


def _skip_unless(subfolder):
    p = _weight_file(subfolder)
    if p is None:
        pytest.skip(f"no real {subfolder} weights under {SD15} "
                    "(zero-egress sandbox); set STORYGEN_SD15_WEIGHTS")
    return p


def test_real_unet_import_matches_torch_mirror():
    import jax
    import jax.numpy as jnp
    from storygen_tpu.checkpoint.hf_import import (load_torch_state_dict,
                                                   torch_to_flax_unet)
    from storygen_tpu.configs import UNetConfig
    from storygen_tpu.models.unet import UNet2DConditionModel
    from tests import torch_mirror as M
    from storygen_tpu.checkpoint.hf_import import apply_attn3_surgery

    path = _skip_unless("unet")
    sd = load_torch_state_dict(path)

    cfg = UNetConfig()  # SD-1.5 defaults (unet/config.json parity)
    unet = UNet2DConditionModel(config=cfg)
    template = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)))
    params = torch_to_flax_unet(sd, template, surgery=True)

    hw, txt = 32, 77
    rng = np.random.RandomState(0)
    x = rng.randn(1, hw, hw, 4).astype(np.float32)
    text = rng.randn(1, txt, 768).astype(np.float32) * 0.2
    eps, ctx = jax.jit(unet.apply)(params, jnp.asarray(x),
                                   jnp.asarray([981]), jnp.asarray(text))

    import torch
    sd_t = M.to_tensors(apply_attn3_surgery(sd))
    xt = torch.from_numpy(x).double().permute(0, 3, 1, 2)
    tt = torch.from_numpy(text).double()
    eps_t, ctx_t = M.unet_forward(sd_t, cfg, xt, torch.tensor([981]), tt)
    want = np.asarray(eps_t.permute(0, 2, 3, 1).float())
    np.testing.assert_allclose(np.asarray(eps), want, rtol=2e-3, atol=2e-3)
    assert set(ctx.keys()) == set(ctx_t.keys())


def test_real_vae_decode_matches_torch_mirror():
    import jax
    import jax.numpy as jnp
    from storygen_tpu.checkpoint.hf_import import (load_torch_state_dict,
                                                   torch_to_flax_vae)
    from storygen_tpu.configs import VAEConfig
    from storygen_tpu.models.vae import AutoencoderKL
    from tests import torch_mirror as M

    path = _skip_unless("vae")
    sd = load_torch_state_dict(path)
    cfg = VAEConfig()
    vae = AutoencoderKL(config=cfg)
    template = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)),
                              jax.random.PRNGKey(0))
    params = torch_to_flax_vae(sd, template)

    z = np.random.RandomState(1).randn(1, 16, 16, 4).astype(np.float32)
    img = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))(
        params, jnp.asarray(z))

    import torch
    sd_t = M.to_tensors(sd)
    zt = torch.from_numpy(z).double().permute(0, 3, 1, 2)
    want_t = M.vae_decode(sd_t, cfg, zt)
    want = np.asarray(want_t.permute(0, 2, 3, 1).float())
    np.testing.assert_allclose(np.asarray(img), want, rtol=2e-3, atol=2e-3)


def test_real_clip_text_matches_transformers():
    import jax
    import jax.numpy as jnp
    from storygen_tpu.checkpoint.hf_import import (load_torch_state_dict,
                                                   torch_to_flax_clip)
    from storygen_tpu.configs import CLIPTextConfig
    from storygen_tpu.models.clip_text import CLIPTextModel

    path = _skip_unless("text_encoder")
    sd = load_torch_state_dict(path)
    cfg = CLIPTextConfig()
    model = CLIPTextModel(config=cfg)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 77), jnp.int32))
    params = torch_to_flax_clip(sd, template)

    ids = np.zeros((1, 77), np.int64)
    ids[0, :5] = [49406, 320, 1125, 539, 49407]
    got = jax.jit(model.apply)(params, jnp.asarray(ids, jnp.int32))

    import torch
    import transformers
    hf = transformers.CLIPTextModel.from_pretrained(
        os.path.join(SD15, "text_encoder"))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
