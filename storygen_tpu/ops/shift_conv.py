"""Shift-GEMM convolution: exact 2-D conv as K_h*K_w shifted matmuls.

Motivation (scripts/bench_conv.py / studies/bench_conv_variants.py, v5e, bf16):
XLA's native implicit-GEMM convs run the SD-UNet's 3x3 sites at 84-156
TF/s (43-79% of the 197 TF/s peak), while the SAME contraction expressed
as plain dot_generals reaches 150-190 TF/s. Reformulating
    y[, i, j, o] = sum_{dy, dx} x_pad[, i*s+dy, j*s+dx, c] * w[dy, dx, c, o]
as K_h*K_w independent (B*H*W, C_in) x (C_in, C_out) matmuls over shifted
slices of the padded input beats the native conv at EVERY measured UNet
site (up to 1.9x at the 1280-channel levels, ~25% aggregate). For strided
convs the im2col single-GEMM form wins instead (the strided slice makes
the 9 patch slices cheap and the deeper K amortizes).

All formulations are exact (same fp32 accumulation, one final rounding);
dispatch is by shape + platform in SConv below. Measured deltas live in
BENCH.md round 3.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Ablation escape hatch: set to False (or env STORYGEN_SHIFT_CONV=0 before
# import) to force the native lax.conv path everywhere.
import os
ENABLED = os.environ.get("STORYGEN_SHIFT_CONV", "1") != "0"
# Ablation escape hatch for the Pallas halo kernel specifically.
HALO_ENABLED = os.environ.get("STORYGEN_HALO_CONV", "1") != "0"
# The stride-2 phase-split kernel is QUARANTINED (opt-in): it faults the
# v5e NONDETERMINISTICALLY (~half of compiled programs, regardless of DMA
# formulation, operand layout, or loop structure — r4 chip stress runs;
# see ops/pallas_conv.py::halo_downconv). Interpret-mode numerics and its
# VJP remain tested; flip on only to re-evaluate on a newer toolchain.
HALO_DOWN_ENABLED = os.environ.get("STORYGEN_HALO_DOWN", "0") == "1"
# In-kernel GN-affine+SiLU prologue fusion is OPT-IN: the r4 chip study
# (scripts/bench_halo_conv.py HALO_FUSED=1) measured the fused variant at
# 0.94-0.97x of prologue-as-XLA + unfused halo at every eligible L1/VAE
# site (e.g. L1 res conv 0.625 vs 0.568 ms), and the headline bench was
# flat-to-worse (0.2624 vs 0.2632 frames/s). The raw-input DMA saves no
# HBM traffic (the XLA prologue fuses into the pad pass) while the
# per-slab fp32 affine work lands on the kernel's critical path.
HALO_FUSED = os.environ.get("STORYGEN_HALO_FUSED", "0") == "1"


def _norm_padding(padding, kh: int, kw: int):
    if padding == "VALID":
        return ((0, 0), (0, 0))
    if padding == "SAME":
        return (((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2))
    return tuple((int(a), int(b)) for a, b in padding)


def shift_conv(x: jax.Array, kernel: jax.Array,
               bias: Optional[jax.Array] = None,
               stride: Union[int, Tuple[int, int]] = 1,
               padding="SAME") -> jax.Array:
    """Exact NHWC conv via shifted dot_generals (fp32 accumulation).

    kernel: (Kh, Kw, Cin, Cout) HWIO — identical layout to nn.Conv.
    """
    kh, kw, cin, cout = kernel.shape
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    (p0, p1), (q0, q1) = _norm_padding(padding, kh, kw)
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (p0, p1), (q0, q1), (0, 0)))
    ho = (h + p0 + p1 - kh) // sh + 1
    wo = (w + q0 + q1 - kw) // sw + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            xs = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + (ho - 1) * sh + 1, dx + (wo - 1) * sw + 1, cin),
                (1, sh, sw, 1))
            y = jax.lax.dot_general(
                xs, kernel[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)


def im2col_conv(x: jax.Array, kernel: jax.Array,
                bias: Optional[jax.Array] = None,
                stride: Union[int, Tuple[int, int]] = 1,
                padding="SAME") -> jax.Array:
    """Exact NHWC conv via patch materialization + one GEMM (wins at
    strided sites where the slices shrink the patch tensor)."""
    kh, kw, cin, cout = kernel.shape
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    (p0, p1), (q0, q1) = _norm_padding(padding, kh, kw)
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (p0, p1), (q0, q1), (0, 0)))
    ho = (h + p0 + p1 - kh) // sh + 1
    wo = (w + q0 + q1 - kw) // sw + 1
    cols = jnp.concatenate(
        [jax.lax.slice(
            xp, (0, dy, dx, 0),
            (b, dy + (ho - 1) * sh + 1, dx + (wo - 1) * sw + 1, cin),
            (1, sh, sw, 1))
         for dy in range(kh) for dx in range(kw)], axis=-1)
    y = jax.lax.dot_general(
        cols, kernel.reshape(kh * kw * cin, cout),
        (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _phase_pack(x: jax.Array, padding, ho: int, wo: int
                ) -> jax.Array:
    """Split the padded input into its four (row, col) parity phases:
    returns ph (B, 2, 2, ho+1, wo+1, C) with
    ph[:, p, q, i, j] = x_pad[:, 2i+p, 2j+q] (zero beyond the pad).

    One relayout pass (pad + reshape + transpose) that the stride-2
    formulations below share: after it, every kernel tap (dy, dx) is a
    CONTIGUOUS window of phase (dy%2, dx%2) — no strided slicing on the
    sublane axis, which is what made the 9-tap strided shift-GEMM lose.
    """
    (p0, p1), (q0, q1) = _norm_padding(padding, 3, 3)
    b, h, w, c = x.shape
    # enough rows/cols for tap offset dy//2 <= 1: 2*(ho+1) x 2*(wo+1)
    hp, wp = 2 * (ho + 1), 2 * (wo + 1)
    xp = jnp.pad(x, ((0, 0), (p0, hp - h - p0), (q0, wp - w - q0),
                     (0, 0)))
    ph = xp.reshape(b, ho + 1, 2, wo + 1, 2, c)
    return ph.transpose(0, 2, 4, 1, 3, 5)


def phase_conv(x: jax.Array, kernel: jax.Array,
               bias: Optional[jax.Array] = None,
               padding="SAME") -> jax.Array:
    """Exact stride-2 3x3 NHWC conv via parity-phase decomposition
    (pure XLA): tap (dy, dx) is a dot_general over a contiguous window
    of phase (dy%2, dx%2) of the padded input. Same fp32 accumulation
    and tap order as shift_conv/im2col — exact to reassociation.

    Reformulation of the quarantined Pallas phase-split kernel
    (ops/pallas_conv.py::halo_downconv) in XLA ops — immune to the
    nondeterministic Mosaic fault, one strided relayout total
    (VERDICT r4 #5; reference sites: diffusers Downsample2D via
    /root/reference/model/unet_2d_blocks.py:5 and the VAE encoder's
    asymmetric-pad strided convs)."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "phase_conv is specialized to 3x3 s2"
    (p0, p1), (q0, q1) = _norm_padding(padding, kh, kw)
    b, h, w, _ = x.shape
    ho = (h + p0 + p1 - 3) // 2 + 1
    wo = (w + q0 + q1 - 3) // 2 + 1
    ph = _phase_pack(x, padding, ho, wo)
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(
                ph, (0, dy % 2, dx % 2, dy // 2, dx // 2, 0),
                (b, dy % 2 + 1, dx % 2 + 1, dy // 2 + ho,
                 dx // 2 + wo, cin))[:, 0, 0]
            y = jax.lax.dot_general(
                xs, kernel[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)


def s2d_conv(x: jax.Array, kernel: jax.Array,
             bias: Optional[jax.Array] = None,
             padding="SAME") -> jax.Array:
    """Exact stride-2 3x3 NHWC conv via space-to-depth: pack the four
    parity phases onto the channel axis ((B, ho+1, wo+1, 4*Cin)), then
    the conv is a stride-1 2x2 conv with a (2, 2, 4*Cin, Cout) kernel
    whose out-of-range taps are zero — 4 tap-GEMMs, one packed-input
    read each. 16/9 the MACs of the 9-tap form (the zero rows ride the
    MXU), in exchange for 9->4 operand reads; wins where the site is
    bandwidth-bound, loses where it is MXU-bound — dispatch measured
    per site (scripts/studies/bench_s2d_conv.py)."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "s2d_conv is specialized to 3x3 s2"
    (p0, p1), (q0, q1) = _norm_padding(padding, kh, kw)
    b, h, w, _ = x.shape
    ho = (h + p0 + p1 - 3) // 2 + 1
    wo = (w + q0 + q1 - 3) // 2 + 1
    ph = _phase_pack(x, padding, ho, wo)  # (B, 2, 2, ho+1, wo+1, C)
    packed = ph.transpose(0, 3, 4, 1, 2, 5).reshape(
        b, ho + 1, wo + 1, 4 * cin)
    # w2[a, b, (p, q, c), o] = kernel[2a+p, 2b+q, c, o], zero past 3
    w2 = jnp.zeros((2, 2, 2, 2, cin, cout), kernel.dtype)
    for a in range(2):
        for bb in range(2):
            for p in range(2):
                for q in range(2):
                    if 2 * a + p < 3 and 2 * bb + q < 3:
                        w2 = w2.at[a, bb, p, q].set(
                            kernel[2 * a + p, 2 * bb + q])
    w2 = w2.reshape(2, 2, 4 * cin, cout)
    acc = None
    for a in range(2):
        for bb in range(2):
            xs = jax.lax.slice(
                packed, (0, a, bb, 0),
                (b, a + ho, bb + wo, 4 * cin))
            y = jax.lax.dot_general(
                xs, w2[a, bb], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)


def _on_tpu() -> bool:
    from storygen_tpu.ops.attention import _on_tpu as f
    return f()


def halo_block_h(x_shape, kernel_size, padding, features: int,
                 itemsize: int, residual: bool = False,
                 fused: bool = False):
    """Halo-kernel eligibility for a stride-1 conv site: the slab height
    to use, or None to stay on shift-GEMM.

    Encodes the measured dispatch table (scripts/bench_halo_conv.py):
    the kernel wins at wide-spatial sites (h*w >= 64x64) except the
    flop-dense 128px cin>=512 shapes, needs 3x3 SAME padding, a W the
    sublane tiling accepts, and a slab that fits the VMEM budget.
    """
    b, h, w, cin = x_shape
    kh, kw = kernel_size
    if not (HALO_ENABLED and (kh, kw) == (3, 3) and w % 8 == 0):
        return None
    if padding != "SAME" and _norm_padding(padding, kh, kw) != ((1, 1),
                                                                (1, 1)):
        return None
    # narrow-channel sites (VAE/UNet conv_in cin=3, conv_out cout=3..4):
    # Mosaic lane-pads both C dims to 128, so the kernel computes/DMAs up
    # to 42x waste — measured 1.7x SLOWER than shift-GEMM at the decoder
    # conv_out (512x512, 128->3: 8.09 vs 4.73 ms, r4 chip probe)
    if min(cin, features) < 64:
        return None
    hw = h * w
    if hw < 64 * 64:
        return None
    # flop-dense mid-spatial band (128px, cin>=512): shift-GEMM already
    # runs ~173 TF/s there and the kernel measured 0.92x
    if 64 * 64 < hw <= 128 * 128 and cin >= 512:
        return None
    from storygen_tpu.ops.pallas_conv import pick_block_h
    return pick_block_h(h, w, cin, features, itemsize, residual=residual,
                        fused=fused)


def down_halo_block_h(x_shape, kernel_size, strides, padding,
                      features: int, itemsize: int):
    """halo_downconv eligibility for a stride-2 site: (block_h, padding)
    or None to stay on im2col/shift-GEMM.

    Initial rule mirrors the measured stride-1 table (wide-spatial wins,
    flop-dense narrow-output cin>=512 band stays put): output >= 32x32
    positions, excluding outputs <= 64x64 with cin >= 512. Refine with
    scripts/studies/bench_down_conv.py measurements per site.
    """
    b, h, w, cin = x_shape
    if not (HALO_DOWN_ENABLED and HALO_ENABLED and kernel_size == (3, 3)
            and tuple(strides) == (2, 2)):
        return None
    if min(cin, features) < 64:  # lane-padding waste; see halo_block_h
        return None
    pad = _norm_padding(padding, 3, 3)
    (p0, p1), (q0, q1) = pad
    ho = (h + p0 + p1 - 3) // 2 + 1
    wo = (w + q0 + q1 - 3) // 2 + 1
    if ho * wo < 32 * 32:
        return None
    if ho * wo <= 64 * 64 and cin >= 512:
        return None
    from storygen_tpu.ops.pallas_conv import pick_down_block_h
    bho = pick_down_block_h(ho, wo, cin, features, itemsize)
    return None if bho is None else (bho, pad)


class SConv(nn.Module):
    """Drop-in nn.Conv with TPU shift-GEMM dispatch.

    Parameters are IDENTICAL to flax nn.Conv (kernel (Kh,Kw,Cin,Cout)
    lecun-normal fp32 + bias zeros), so checkpoint import/export and all
    param-tree goldens are unchanged. Dispatch:
      - off-TPU or ENABLED=False: lax.conv (nn.Conv semantics),
      - 1x1: plain channel dot,
      - strided: im2col GEMM,
      - else: shift-GEMM.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Union[int, Tuple[int, int]] = (1, 1)
    padding: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 prologue: Optional[Tuple[jax.Array, jax.Array]] = None,
                 extra_bias: Optional[jax.Array] = None,
                 residual: Optional[jax.Array] = None) -> jax.Array:
        """`prologue=(a, s)` — per-batch per-channel fp32 affine + SiLU
        (a folded GroupNorm, models/layers.py::GroupNorm fold_affine)
        applied to x BEFORE the conv: at halo-eligible 3x3 stride-1
        sites it fuses into the kernel's VMEM slab load (the normalized
        tensor never reaches HBM); everywhere else it is applied as the
        same XLA elementwise pass GroupNorm would have emitted.
        `extra_bias` (B, Cout) adds per-batch output bias (the resnet
        temb term) — folded into the kernel's output write at halo
        sites, a plain (XLA-fused) add elsewhere.
        `residual` (B, Ho, Wo, Cout) adds the resnet skip tensor to the
        output — streamed through the halo kernel's output pipeline at
        fused sites, a plain add elsewhere."""
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x_raw = x

        def _apply_prologue(xx: jax.Array) -> jax.Array:
            if prologue is None:
                return xx.astype(self.dtype)
            a, s = prologue
            bsh = (xx.shape[0],) + (1,) * (xx.ndim - 2) + (xx.shape[-1],)
            z = (xx.astype(jnp.float32) * a.astype(jnp.float32).reshape(bsh)
                 + s.astype(jnp.float32).reshape(bsh))
            return (z * jax.nn.sigmoid(z)).astype(self.dtype)

        def _add_extra(y: jax.Array) -> jax.Array:
            if extra_bias is not None:
                y = (y + extra_bias[:, None, None, :].astype(y.dtype)) \
                    .astype(self.dtype)
            if residual is not None:
                y = y + residual  # jnp promotion — matches the unfused
            return y              # `skip + h` the resnet used to emit

        k = kernel.astype(self.dtype)
        bc = bias.astype(self.dtype)
        sh, sw = ((self.strides, self.strides)
                  if isinstance(self.strides, int) else self.strides)
        if (ENABLED and _on_tpu() and sh == sw == 1 and (kh, kw) == (3, 3)):
            # Default: prologue as an XLA pass (it fuses into the halo
            # pad), halo kernel on the normalized tensor. HALO_FUSED=1
            # streams the RAW input and applies the prologue per-slab in
            # VMEM instead — measured 0.94-0.97x, kept for re-evaluation.
            fuse = prologue is not None and HALO_FUSED
            # Cast BEFORE dispatch either way: the fused kernels must see
            # self.dtype input (an fp32 x under a bf16 policy would run
            # the kernel fp32 — different numerics/VMEM than the unfused
            # dispatch — and its custom_vjp would return db in the fp32
            # cotangent dtype against a bf16 beff primal).
            xin = x_raw.astype(self.dtype) if fuse \
                else _apply_prologue(x_raw)
            bh_f = halo_block_h(xin.shape, (kh, kw), self.padding,
                                self.features, xin.dtype.itemsize,
                                residual=fuse and residual is not None,
                                fused=fuse)
            if bh_f is not None:
                beff = bc if extra_bias is None \
                    else (bc[None] + extra_bias.astype(self.dtype))
                from storygen_tpu.ops.pallas_conv import (conv3x3,
                                                          gnconv3x3,
                                                          gnconvres3x3)
                if fuse and residual is not None:
                    a, s = prologue
                    return gnconvres3x3(xin, a, s, k, beff,
                                        residual.astype(self.dtype), bh_f)
                if fuse:
                    a, s = prologue
                    return gnconv3x3(xin, a, s, k, beff, bh_f)
                y = conv3x3(xin.astype(self.dtype), k, beff, bh_f)
                return y if residual is None else y + residual
        x = _apply_prologue(x)
        if ENABLED and _on_tpu():
            if kh == 1 and kw == 1 and sh == sw == 1:
                y = jax.lax.dot_general(
                    x, k[0, 0], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return _add_extra(
                    (y + bc.astype(jnp.float32)).astype(self.dtype))
            if sh > 1 or sw > 1:
                dn = down_halo_block_h(x.shape, (kh, kw), (sh, sw),
                                       self.padding, self.features,
                                       x.dtype.itemsize)
                if dn is not None:
                    # Wide-spatial stride-2 sites: phase-split halo
                    # kernel (one input read vs im2col's patch
                    # write+read; that path measured 29% of bound at the
                    # 64x64 UNet downsample, scripts/roofline_conv.py).
                    from storygen_tpu.ops.pallas_conv import downconv3x3
                    bho, pad = dn
                    return _add_extra(downconv3x3(x, k, bc, pad, bho))
                if (kh, kw) == (3, 3) and sh == sw == 2:
                    # Measured 3x3-s2 dispatch (r5 study,
                    # scripts/studies/bench_s2d_conv.py on v5e): XLA's
                    # implicit-GEMM conv wins every wide/batched site —
                    # 3.0x over the old im2col at the 64px UNet
                    # downsample (0.190 vs 0.570 ms b9) and 13-26x at
                    # the batched 512px VAE-encoder sites. The parity-
                    # phase decomposition (phase_conv) wins the deep
                    # narrow-spatial band instead: L3 down 1.29x, L2
                    # down 1.03x, VAE enc 128px 1.06x over native.
                    # im2col won NO 3x3-s2 site; the s2d channel-packed
                    # form lost everywhere (16/9 MAC overhead).
                    if cin >= 512 and x.size <= 10 * 2 ** 20:
                        return _add_extra(
                            phase_conv(x, k, bc, self.padding))
                    y = jax.lax.conv_general_dilated(
                        x, k, (sh, sw), _norm_padding(self.padding, kh, kw),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return _add_extra(
                        (y.astype(jnp.float32)
                         + bc.astype(jnp.float32)).astype(self.dtype))
                # non-3x3 strided kernels: im2col GEMM while the patch
                # tensor stays small, native conv beyond
                b_, h_, w_ = x.shape[0], x.shape[1] // sh, x.shape[2] // sw
                cols_bytes = b_ * h_ * w_ * kh * kw * cin * x.dtype.itemsize
                if cols_bytes <= 64 * 2 ** 20:
                    return _add_extra(
                        im2col_conv(x, k, bc, (sh, sw), self.padding))
            else:
                bh = halo_block_h(x.shape, (kh, kw), self.padding,
                                  self.features, x.dtype.itemsize)
                if bh is not None:
                    # Wide-spatial sites: the VMEM halo kernel reads the
                    # input once instead of 9 tap-reads — measured 1.1-1.6x
                    # over shift-GEMM at every 64x64 UNet site and up to
                    # 5.8x at the VAE decoder's 512px sites. Deeper/smaller
                    # sites (32x32 UNet; 128px cin>=512 VAE) already run at
                    # >=75% of roofline on shift-GEMM and lose ~5% to the
                    # kernel, so they stay on the dot_general path
                    # (measurements: scripts/bench_halo_conv.py).
                    from storygen_tpu.ops.pallas_conv import conv3x3
                    return _add_extra(conv3x3(x, k, bc, bh))
                return _add_extra(
                    shift_conv(x, k, bc, (sh, sw), self.padding))
        pad = self.padding
        if pad not in ("SAME", "VALID"):
            pad = tuple((int(a), int(b)) for a, b in pad)
        y = jax.lax.conv_general_dilated(
            x, k, (sh, sw), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _add_extra(y + bc)
