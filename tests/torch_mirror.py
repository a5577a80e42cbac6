"""Plain-torch re-execution of the reference StoryGen UNet + sampler math.

This is the cross-implementation ORACLE for tests/test_torch_golden.py: an
independent functional implementation of the reference's composed forward
(diffusers-0.13 semantics + the StoryGen VLCM fork), driven directly by a
diffusers-keyed state dict as produced by
storygen_tpu.checkpoint.hf_export.flax_to_torch_state_dict. Every weight
access is a dict lookup by the exact diffusers key, so a run also
validates the export key layout end-to-end.

Reference parity map (all /root/reference):
- transformer block math (attn1 tap, parallel attn2/attn3 sum, GEGLU ff):
  model/attention.py:236-302
- Transformer2DModel (GN eps 1e-6, 1x1 conv proj in/out, residual):
  model/attention.py:85-128
- down/mid/up blocks incl. the CONSUME-side resolution-keyed context
  lookup (down ln = 4 - H//16 clamped >=1, up ln = H//16 clamped <=3):
  model/unet_2d_blocks.py:380-381,600-601,291
- UNet forward + COLLECT-side block-identity keys down_{i+1}_{1,2} /
  mid / up_{i}_{1,2,3}: model/unet_2d_condition.py:411-485
- scheduler (scaled_linear betas, leading-spaced timesteps + offset 1,
  set_alpha_to_one=false): ckpt/stable-diffusion-v1-5/scheduler/
  scheduler_config.json; DDIM update model/pipeline.py:461
- per-step reference cycle + kv concat + 3-way CFG:
  model/pipeline.py:411-469

NOT a port of the reference code: written from the math, as a test-only
oracle (functional style, no nn.Module state).
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import torch
import torch.nn.functional as F

Tensors = Dict[str, torch.Tensor]


def to_tensors(state_dict: Dict[str, np.ndarray]) -> Tensors:
    return {k: torch.from_numpy(np.ascontiguousarray(v)).double()
            for k, v in state_dict.items()}


# ------------------------------------------------------------ primitives
def _gn(x, sd, p, groups, eps):
    return F.group_norm(x, groups, sd[p + ".weight"], sd[p + ".bias"], eps)


def _ln(x, sd, p):
    return F.layer_norm(x, x.shape[-1:], sd[p + ".weight"], sd[p + ".bias"],
                        1e-5)


def _conv(x, sd, p, stride=1, padding=1):
    return F.conv2d(x, sd[p + ".weight"], sd[p + ".bias"], stride, padding)


def _linear(x, sd, p, bias=True):
    return F.linear(x, sd[p + ".weight"],
                    sd[p + ".bias"] if bias else None)


def _attention(x, context, sd, p, heads):
    """diffusers CrossAttention: softmax(q k^T / sqrt(d)) v with
    multi-head reshape; to_q/k/v without bias, to_out.0 with bias."""
    q = _linear(x, sd, p + ".to_q", bias=False)
    k = _linear(context, sd, p + ".to_k", bias=False)
    v = _linear(context, sd, p + ".to_v", bias=False)
    b, sq, inner = q.shape
    d = inner // heads

    def split(t):
        return t.reshape(b, -1, heads, d).permute(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    # per-(batch, head) serial loop: bounds the (Sq, Skv) logits to one
    # fp64 matrix at a time (4096^2 x 8B = 134 MB at the L1 test shape)
    outs = []
    for bi in range(b):
        rows = []
        for hi in range(heads):
            attn = torch.softmax(
                qh[bi, hi] @ kh[bi, hi].T * d ** -0.5, dim=-1)
            rows.append(attn @ vh[bi, hi])
        outs.append(torch.stack(rows))
    out = torch.stack(outs).permute(0, 2, 1, 3).reshape(b, sq, inner)
    return _linear(out, sd, p + ".to_out.0")


def _feed_forward(x, sd, p):
    """GEGLU (value-first chunk) -> linear (diffusers FeedForward;
    model/attention.py:305-393)."""
    proj = _linear(x, sd, p + ".net.0.proj")
    value, gate = proj.chunk(2, dim=-1)
    return _linear(value * F.gelu(gate), sd, p + ".net.2")


def _transformer_block(x, sd, p, text, heads, img_feat=None):
    """attn1 -> [tap] -> (attn2 || attn3) -> sum -> ff
    (model/attention.py:236-302). Returns (hidden, tap)."""
    norm1 = _ln(x, sd, p + ".norm1")
    h = _attention(norm1, norm1, sd, p + ".attn1", heads) + x
    tap = h.clone()
    h_t = _attention(_ln(h, sd, p + ".norm2"), text, sd, p + ".attn2",
                     heads) + h
    if img_feat is not None:
        h_i = _attention(_ln(h, sd, p + ".norm4"), img_feat, sd,
                         p + ".attn3", heads) + h
        h = h_t + h_i
    else:
        h = h_t
    h = _feed_forward(_ln(h, sd, p + ".norm3"), sd, p + ".ff") + h
    return h, tap


def _transformer2d(x, sd, p, text, heads, groups, img_feat=None):
    """GN(eps 1e-6) -> 1x1 conv -> block -> 1x1 conv -> +residual
    (model/attention.py:85-128, use_linear_projection=False)."""
    b, c, hh, ww = x.shape
    res = x
    h = _gn(x, sd, p + ".norm", groups, 1e-6)
    h = _conv(h, sd, p + ".proj_in", padding=0)
    inner = h.shape[1]
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, inner)
    h, tap = _transformer_block(h, sd, p + ".transformer_blocks.0", text,
                                heads, img_feat)
    h = h.reshape(b, hh, ww, inner).permute(0, 3, 1, 2)
    h = _conv(h, sd, p + ".proj_out", padding=0)
    return h + res, tap


def _resnet(x, temb, sd, p, groups, eps=1e-5):
    """diffusers ResnetBlock2D default config (pre_norm, silu,
    output_scale_factor 1)."""
    h = F.silu(_gn(x, sd, p + ".norm1", groups, eps))
    h = _conv(h, sd, p + ".conv1")
    h = h + _linear(F.silu(temb), sd, p + ".time_emb_proj")[:, :, None, None]
    h = F.silu(_gn(h, sd, p + ".norm2", groups, eps))
    h = _conv(h, sd, p + ".conv2")
    if p + ".conv_shortcut.weight" in sd:
        x = _conv(x, sd, p + ".conv_shortcut", padding=0)
    return x + h


def _timestep_embedding(t, dim):
    """Timesteps(flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000) *
                      torch.arange(half, dtype=torch.float64) / half)
    args = t.double()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


# ------------------------------------------------------------ UNet forward
def unet_forward(sd: Tensors, cfg, sample: torch.Tensor,
                 t: torch.Tensor, text: torch.Tensor,
                 image_hidden_states: Optional[Tensors] = None):
    """The reference UNet2DConditionModel.forward
    (model/unet_2d_condition.py:338-485). NCHW tensors.

    Returns (eps_prediction, collected img_dif_conditions dict). The
    collected dict uses the reference's COLLECT keys (block identity);
    the consume path uses the reference's resolution formula — identical
    at 64x64 latents (512px operating point).
    """
    heads = cfg.attention_head_dim
    groups = cfg.norm_num_groups
    b = sample.shape[0]
    if t.ndim == 0:
        t = t.expand(b)

    emb = _timestep_embedding(t, cfg.block_out_channels[0])
    emb = _linear(emb, sd, "time_embedding.linear_1")
    emb = _linear(F.silu(emb), sd, "time_embedding.linear_2")

    h = _conv(sample, sd, "conv_in")
    collected: Tensors = {}
    res_stack = [h]

    # down blocks
    for bi, btype in enumerate(cfg.down_block_types):
        p = f"down_blocks.{bi}"
        is_final = bi == len(cfg.down_block_types) - 1
        if btype == "CrossAttnDownBlock2D":
            # consume key level: ln = 4 - H//16 clamped >= 1
            # (unet_2d_blocks.py:380-381)
            ln_key = max(4 - h.shape[2] // 16, 1)
            taps = []
            for li in range(cfg.layers_per_block):
                h = _resnet(h, emb, sd, f"{p}.resnets.{li}", groups)
                feat = None
                if image_hidden_states is not None:
                    feat = image_hidden_states[f"down_{ln_key}_{li + 1}"]
                h, tap = _transformer2d(h, sd, f"{p}.attentions.{li}",
                                        text, heads, groups, feat)
                taps.append(tap)
                res_stack.append(h)
            if image_hidden_states is None:
                # collect keys: block identity (unet_2d_condition.py:427-429)
                collected[f"down_{bi + 1}_1"] = taps[0]
                collected[f"down_{bi + 1}_2"] = taps[1]
        else:  # DownBlock2D
            for li in range(cfg.layers_per_block):
                h = _resnet(h, emb, sd, f"{p}.resnets.{li}", groups)
                res_stack.append(h)
        if not is_final:
            h = _conv(h, sd, f"{p}.downsamplers.0.conv", stride=2)
            res_stack.append(h)

    # mid block (unet_2d_blocks.py:269-297)
    h = _resnet(h, emb, sd, "mid_block.resnets.0", groups)
    feat = (image_hidden_states["mid"]
            if image_hidden_states is not None else None)
    h, tap = _transformer2d(h, sd, "mid_block.attentions.0", text, heads,
                            groups, feat)
    if image_hidden_states is None:
        collected["mid"] = tap
    h = _resnet(h, emb, sd, "mid_block.resnets.1", groups)

    # up blocks
    for bi, btype in enumerate(cfg.up_block_types):
        p = f"up_blocks.{bi}"
        is_final = bi == len(cfg.up_block_types) - 1
        n_layers = cfg.layers_per_block + 1
        if btype == "CrossAttnUpBlock2D":
            # consume key level: ln = H//16 clamped <= 3
            # (unet_2d_blocks.py:600-601)
            ln_key = min(h.shape[2] // 16, 3)
            taps = []
            for li in range(n_layers):
                h = torch.cat([h, res_stack.pop()], dim=1)
                h = _resnet(h, emb, sd, f"{p}.resnets.{li}", groups)
                feat = None
                if image_hidden_states is not None:
                    feat = image_hidden_states[f"up_{ln_key}_{li + 1}"]
                h, tap = _transformer2d(h, sd, f"{p}.attentions.{li}",
                                        text, heads, groups, feat)
                taps.append(tap)
            if image_hidden_states is None:
                # collect keys: up_{i}_{1,2,3} with i = enumerate index
                # (unet_2d_condition.py:469-471)
                for li in range(n_layers):
                    collected[f"up_{bi}_{li + 1}"] = taps[li]
        else:  # UpBlock2D
            for li in range(n_layers):
                h = torch.cat([h, res_stack.pop()], dim=1)
                h = _resnet(h, emb, sd, f"{p}.resnets.{li}", groups)
        if not is_final:
            # nearest 2x + 3x3 conv (diffusers Upsample2D)
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv(h, sd, f"{p}.upsamplers.0.conv")

    h = F.silu(_gn(h, sd, "conv_norm_out", groups, cfg.norm_eps))
    h = _conv(h, sd, "conv_out")
    return h, collected


# ------------------------------------------------------------ scheduler
class DDIMMirror:
    """scaled_linear DDIM with steps_offset=1, set_alpha_to_one=false
    (scheduler_config.json; diffusers 0.13 semantics)."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012):
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.final_alpha_cumprod = self.alphas_cumprod[0]
        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = 1

    def timesteps(self, num_inference_steps):
        ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round()[::-1]
        return (ts + self.steps_offset).astype(np.int64)

    def add_noise(self, x, noise, t):
        acp = torch.as_tensor(self.alphas_cumprod)[t].reshape(
            -1, *([1] * (x.ndim - 1)))
        return torch.sqrt(acp) * x + torch.sqrt(1 - acp) * noise

    def step(self, eps, t, prev_t, x):
        acp_t = self.alphas_cumprod[t]
        acp_prev = (self.alphas_cumprod[prev_t] if prev_t >= 0
                    else self.final_alpha_cumprod)
        x0 = (x - math.sqrt(1 - acp_t) * eps) / math.sqrt(acp_t)
        return (math.sqrt(acp_prev) * x0
                + math.sqrt(1 - acp_prev) * eps)


def storygen_step(sd: Tensors, cfg, sched: DDIMMirror, latents, t, prev_t,
                  text_uncond, text_cond, ref_latents, zero_latents,
                  prev_text_uncond, prev_text_cond, noise, guidance_scale,
                  image_guidance_scale, stage="auto-regressive"):
    """One full reference denoise step, literally as model/pipeline.py
    :411-469 computes it: per-ref 3-row reference pass, per-layer kv
    concat across refs, 3-row main pass, 3-way CFG, DDIM update."""
    n = ref_latents.shape[0]
    ref_t = int(t) // 10  # (t/10).long(), pipeline.py:414-415
    img_conditions = []
    for i in range(n):
        lvl = ref_t * (n - i) if stage == "auto-regressive" else ref_t
        tt = torch.tensor([lvl])
        noisy_ref = sched.add_noise(ref_latents[i], noise, tt)
        noisy_zero = sched.add_noise(zero_latents, noise, tt)
        rows = torch.cat([noisy_zero, noisy_ref, noisy_ref], dim=0)
        text_rows = torch.cat([prev_text_uncond[i], prev_text_cond[i],
                               prev_text_cond[i]], dim=0)
        _, cond = unet_forward(sd, cfg, rows, torch.tensor(lvl), text_rows)
        img_conditions.append(cond)
    merged = {k: torch.cat([c[k] for c in img_conditions], dim=1)
              for k in img_conditions[0]}
    text3 = torch.cat([text_uncond, text_uncond, text_cond], dim=0)
    lat3 = torch.cat([latents] * 3, dim=0)
    eps3, _ = unet_forward(sd, cfg, lat3, torch.tensor(int(t)), text3,
                           image_hidden_states=merged)
    e_u, e_i, e_a = eps3.chunk(3)
    eps = (e_u + image_guidance_scale * (e_i - e_u)
           + guidance_scale * (e_a - e_i))
    return sched.step(eps, int(t), int(prev_t), latents)


# ------------------------------------------------------------ VAE mirror
def _vae_resnet(x, sd, p, groups):
    """diffusers ResnetBlock2D as AutoencoderKL instantiates it: GN eps
    1e-6, SiLU, no time embedding (reference loads diffusers
    AutoencoderKL, /root/reference/model/pipeline.py:16; architecture per
    ckpt/stable-diffusion-v1-5/vae/config.json)."""
    h = _conv(F.silu(_gn(x, sd, p + ".norm1", groups, 1e-6)),
              sd, p + ".conv1")
    h = _conv(F.silu(_gn(h, sd, p + ".norm2", groups, 1e-6)),
              sd, p + ".conv2")
    if p + ".conv_shortcut.weight" in sd:
        x = F.conv2d(x, sd[p + ".conv_shortcut.weight"],
                     sd[p + ".conv_shortcut.bias"])
    return x + h


def _vae_attention(x, sd, p, groups):
    """diffusers AttentionBlock: single-head spatial self-attention with
    query/key/value/proj_attn linears over GN'd tokens, residual add."""
    b, c, h, w = x.shape
    y = _gn(x, sd, p + ".group_norm", groups, 1e-6)
    y = y.reshape(b, c, h * w).transpose(1, 2)
    q = _linear(y, sd, p + ".query")
    k = _linear(y, sd, p + ".key")
    v = _linear(y, sd, p + ".value")
    probs = torch.softmax(q @ k.transpose(1, 2) * c ** -0.5, dim=-1)
    y = _linear(probs @ v, sd, p + ".proj_attn")
    return y.transpose(1, 2).reshape(b, c, h, w) + x


def vae_encode(sd: Tensors, cfg, x: torch.Tensor):
    """Encoder + quant_conv -> (mean, clamped logvar), NCHW.

    Downsample is the reference's asymmetric form: F.pad (0,1,0,1) then
    stride-2 VALID conv (diffusers Downsample2D with padding=0)."""
    g = cfg.norm_num_groups
    h = _conv(x, sd, "encoder.conv_in")
    n = len(cfg.block_out_channels)
    for i in range(n):
        p = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            h = _vae_resnet(h, sd, f"{p}.resnets.{j}", g)
        if i < n - 1:
            h = F.pad(h, (0, 1, 0, 1))
            h = _conv(h, sd, f"{p}.downsamplers.0.conv", stride=2,
                      padding=0)
    h = _vae_resnet(h, sd, "encoder.mid_block.resnets.0", g)
    h = _vae_attention(h, sd, "encoder.mid_block.attentions.0", g)
    h = _vae_resnet(h, sd, "encoder.mid_block.resnets.1", g)
    h = F.silu(_gn(h, sd, "encoder.conv_norm_out", g, 1e-6))
    h = _conv(h, sd, "encoder.conv_out")
    moments = F.conv2d(h, sd["quant_conv.weight"], sd["quant_conv.bias"])
    mean, logvar = moments.chunk(2, dim=1)
    return mean, torch.clamp(logvar, -30.0, 20.0)


def vae_decode(sd: Tensors, cfg, z: torch.Tensor) -> torch.Tensor:
    """post_quant_conv + decoder -> image, NCHW. Upsample is nearest-2x
    followed by a 3x3 conv (diffusers Upsample2D)."""
    g = cfg.norm_num_groups
    h = F.conv2d(z, sd["post_quant_conv.weight"],
                 sd["post_quant_conv.bias"])
    h = _conv(h, sd, "decoder.conv_in")
    h = _vae_resnet(h, sd, "decoder.mid_block.resnets.0", g)
    h = _vae_attention(h, sd, "decoder.mid_block.attentions.0", g)
    h = _vae_resnet(h, sd, "decoder.mid_block.resnets.1", g)
    n = len(cfg.block_out_channels)
    for i in range(n):
        p = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            h = _vae_resnet(h, sd, f"{p}.resnets.{j}", g)
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv(h, sd, f"{p}.upsamplers.0.conv")
    h = F.silu(_gn(h, sd, "decoder.conv_norm_out", g, 1e-6))
    return _conv(h, sd, "decoder.conv_out")
