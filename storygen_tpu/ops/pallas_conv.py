"""VMEM-resident halo convolution (Pallas TPU): 3x3 stride-1 NHWC.

Why this kernel exists (scripts/roofline_conv.py, BENCH.md round 3): the
shift-GEMM formulation (ops/shift_conv.py) re-reads the input once per
tap, so the UNet's wide-spatial narrow-channel L1 sites (64x64, 320-960
channels) run at 29-67% of their roofline while the deep L2-L4 sites sit
at 75-95%. Here each grid step DMAs ONE (block_h+2)-row halo slab of the
padded input from HBM into VMEM and feeds all nine tap-GEMMs from VMEM,
with the fp32 partial sums living entirely in registers/VMEM:

  HBM traffic = 1x input read + 1x output write   (vs 9x reads + XLA's
  partial-sum scheduling for shift-GEMM)

Grid is (B, H/block_h); the halo rows make adjacent slabs OVERLAP, which
BlockSpec index maps cannot express (start = index * block_shape), hence
the manual `pltpu.make_async_copy` from a `pltpu.HBM`-space operand. The
inner loop runs dx (sublane shift — one cheap relayout per dx) outer and
dy (tile-row slice — free) inner, so only 3 shifted views are
materialized per slab, not 9.

The public entry `conv3x3` is a jax.custom_vjp: forward is this kernel,
backward is expressed with the already-tested XLA formulations (input
grad = shift-GEMM conv with the spatially flipped, io-transposed kernel;
weight grad = 9 tap dot_generals with a B*H*W contraction the MXU
loves), so SConv stays trainable.

Parity anchor: this computes exactly diffusers' Conv2d(3,3,pad=1) sites
used by the reference UNet/VAE (/root/reference/model/unet_2d_blocks.py
via ResnetBlock2D); numerics match shift_conv bit-for-bit in fp32
accumulation up to add-reassociation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from storygen_tpu.ops.shift_conv import halo_block_h, shift_conv

# v5e VMEM is ~16 MB/core; leave headroom for Mosaic's own buffers. The
# budget model is truthful since r4 (lane-padded cout; fused-prologue
# temporaries bounded by row-chunking and charged explicitly): the model
# over-predicted the one measured OOM by only 2.7% (24.85M predicted vs
# 24.18M real scoped alloc), and the chip-probed fused L1/VAE sites sit
# 13.7-15.0M modeled and run — so 15M of the 16M limit is safe margin.
#
# REVALIDATE ON TOOLCHAIN BUMPS: the <1 MiB of headroom is calibrated
# against the current Mosaic; a compiler update that grows its own
# scratch buffers could reintroduce site OOMs. scripts/tpu_kernel_check.py
# ("vmem_ceiling") executes the highest-modeled eligible site on every
# gated suite run, so a budget regression fails loudly there first —
# if it does, lower VMEM_BUDGET (or fix vmem_need's model) before
# touching any dispatch table.
VMEM_BUDGET = 15 * 2 ** 20


def _kernel(xp_ref, w_ref, b_ref, a_ref, s_ref, *rest,
            bh: int, w: int, cin: int, cout: int, h: int, wp: int,
            fused: bool, has_res: bool):
    """Double-buffered slab pipeline: each grid step prefetches the NEXT
    step's halo slab into the other buffer slot before computing, so the
    HBM copy overlaps the nine tap-GEMMs. The serial start/wait form left
    the MXU idle for the full slab-DMA latency every step — measured as
    most of the L1 sites' 33-39% roofline gap (BENCH.md round 4).

    With `fused`, the per-batch per-channel affine (a, s) + SiLU — the
    folded GroupNorm epilogue diffusers always puts in front of these
    convs — is applied to the slab IN VMEM before the tap-GEMMs, masked
    back to zero at the SAME-padding border rows/cols (silu(s) != 0
    there). Saves the separate normalize pass's HBM write + read of x.
    With `has_res`, a residual block streams in through the standard
    BlockSpec pipeline and is added to the accumulator before the output
    write — the bare conv result never exists in HBM un-added."""
    if has_res:
        r_ref, o_ref, slab, sem = rest
    else:
        o_ref, slab, sem = rest
        r_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    step = b * ni + i
    slot = jax.lax.rem(step, 2)

    def _copy(bb, ii, sl):
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh, bh + 2)], slab.at[sl], sem.at[sl])

    @pl.when(step == 0)
    def _():
        _copy(b, i, slot).start()

    @pl.when(step < pl.num_programs(0) * ni - 1)
    def _():
        last_i = i == ni - 1
        nxt_b = jax.lax.select(last_i, b + 1, b)
        nxt_i = jax.lax.select(last_i, 0, i + 1)
        _copy(nxt_b, nxt_i, 1 - slot).start()

    _copy(b, i, slot).wait()
    if fused:
        a32 = a_ref[0, 0].astype(jnp.float32)
        s32 = s_ref[0, 0].astype(jnp.float32)
        # CHUNKED over slab rows: the whole-slab form materialized ~3
        # fp32 slab-sized temporaries (z, sigmoid, masked act) on the
        # Mosaic stack — measured scoped alloc exceeded the picker's
        # model by 2.94x the fp32 slab size and OOM'd the VAE-encoder
        # 256px site (B3 128->256: 18.82M real vs 12.01M modeled, r4).
        # Bounding the live temporaries to PRO_CHUNK rows keeps the
        # fused path's VMEM overhead ~2M at any site; the leading slab
        # dim is untiled so row slices are free.
        ck = _prologue_chunk(wp, cin)
        for c0 in range(0, bh + 2, ck):
            rc = min(ck, bh + 2 - c0)
            z = slab[slot, c0:c0 + rc].astype(jnp.float32) * a32 + s32
            act = z * jax.nn.sigmoid(z)
            rows = (jax.lax.broadcasted_iota(jnp.int32, (rc, wp), 0)
                    + i * bh + c0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (rc, wp), 1)
            # f32 multiplicative mask: Mosaic only supports non-no-op
            # minor-dim insertion for 32-bit types, so a bool `where`
            # mask can't be broadcast over the lane dim.
            keep = ((rows >= 1) & (rows <= h) & (cols >= 1)
                    & (cols <= w)).astype(jnp.float32)
            slab[slot, c0:c0 + rc] = (act * keep[:, :, None]) \
                .astype(slab.dtype)
    # Tile the accumulation over <=128-wide cout stripes: the fp32 tap
    # product y and the accumulator live SIMULTANEOUSLY on the Mosaic
    # stack (plus the output-cast temp), so at wide-cout sites the
    # untiled form's fp32 working set is ~3x bh*w*coutp*4 — the r4
    # quality run OOM'd exactly there (VAE enc 256px cout 256: 18.8M
    # scoped vs 12.0M modeled). 128 stripes keep the MXU at full lane
    # width; the dx sublane-shifted views are re-sliced per stripe
    # (VMEM-bandwidth cheap vs the 9 GEMMs).
    csz = min(cout, 128)
    for ct in range(0, cout, csz):
        cw = min(csz, cout - ct)
        acc = None
        for dx in range(3):
            # one sublane-shifted view per dx; dy slices along the
            # untiled leading dim are free
            xs3 = slab[slot, :, dx:dx + w, :]
            for dy in range(3):
                xs = xs3[dy:dy + bh].reshape(bh * w, cin)
                y = jax.lax.dot_general(
                    xs, w_ref[3 * dy + dx, :, ct:ct + cw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
        acc = acc + b_ref[0, 0, ct:ct + cw].astype(jnp.float32)
        if has_res:
            acc = acc + r_ref[0, :, :, ct:ct + cw] \
                .reshape(bh * w, cw).astype(jnp.float32)
        o_ref[0, :, :, ct:ct + cw] = \
            acc.reshape(bh, w, cw).astype(o_ref.dtype)


def _prologue_chunk(wp: int, cin: int) -> int:
    """Row-chunk height for the fused prologue: the largest multiple-of-2
    row count whose ~3 fp32 (rc, wp, cinp) temporaries stay under 1 MB.
    Static — both the kernel loop and the VMEM charge use it."""
    cinp = cin + (-cin) % 128
    per_row = 3 * wp * cinp * 4
    return max(2, (2 ** 20 // per_row) & ~1)


def pick_block_h(h: int, w: int, cin: int, cout: int,
                 itemsize: int = 2, residual: bool = False,
                 fused: bool = False) -> Optional[int]:
    """Largest row-slab height whose working set fits the VMEM budget.

    Working set: two halo slab slots (the input DMA is double-buffered)
    + one dx-shifted view + full weights + double-buffered output block
    + fp32 accumulator. Returns None if no slab height fits (caller
    falls back to shift-GEMM).

    Mosaic lane-pads the LAST dim of every VMEM buffer to 128, so cout
    must be charged at its padded width — the r3 bench OOM'd exactly here
    (VAE conv_out, cout 3: real scoped alloc 24.18M at bh=32 vs an 8.9M
    raw-cout estimate; the padded model predicts 24.85M).

    `fused` charges the prologue's fp32 row-chunk temporaries (~2 MB by
    construction, see _prologue_chunk) — the unchunked form's ~3 full
    fp32 slabs OOM'd the VAE-encoder 256px site in r4's quality run.
    """
    for bh in (32, 16, 8):
        if h % bh:
            continue
        if vmem_need(bh, h, w, cin, cout, itemsize, residual=residual,
                     fused=fused) <= VMEM_BUDGET:
            return bh
    return None


def vmem_need(bh: int, h: int, w: int, cin: int, cout: int,
              itemsize: int = 2, residual: bool = False,
              fused: bool = False) -> int:
    """Modeled VMEM bytes for halo_conv at slab height `bh` — the
    acceptance model pick_block_h tests against VMEM_BUDGET, exposed so
    the on-chip gate (scripts/tpu_kernel_check.py "vmem_ceiling") can
    find and execute the highest-modeled eligible site."""
    wp = w + 2 + (-(w + 2)) % 8
    cinp = cin + (-cin) % 128
    coutp = cout + (-cout) % 128
    ctile = min(coutp, 128)
    need = (2 * (bh + 2) * wp * cinp * itemsize      # 2 slab slots
            + (bh + 2) * w * cinp * itemsize         # live dx view
            + 9 * cinp * coutp * itemsize            # weights
            + 2 * bh * w * coutp * itemsize          # out blocks
            + 2 * bh * w * ctile * 4                 # fp32 acc + tap y
            + bh * w * ctile * itemsize)             # out-cast temp
    if residual:
        need += 2 * bh * w * coutp * itemsize        # res in-blocks
    if fused:
        ck = min(_prologue_chunk(wp, cin), bh + 2)
        need += 3 * ck * wp * cinp * 4               # prologue temps
    return need


def halo_conv(x: jax.Array, kernel: jax.Array,
              bias: Optional[jax.Array] = None,
              block_h: Optional[int] = None,
              interpret: bool = False,
              prologue: Optional[tuple] = None,
              residual: Optional[jax.Array] = None) -> jax.Array:
    """3x3 stride-1 SAME conv, NHWC, kernel HWIO — forward only.

    Requires H % block_h == 0 (pick_block_h guarantees it). Accumulates
    in fp32, returns x.dtype.

    `bias` may be (Cout,) shared or (B, Cout) per-batch — the latter
    folds the resnet time-embedding add (h + temb_proj[:, None, None])
    into the output write instead of a separate HBM pass.
    `prologue=(a, s)`, each (B, Cin) fp32, applies silu(x*a + s) to the
    slab in VMEM before the tap-GEMMs (the folded GroupNorm+SiLU that
    precedes every diffusers resnet conv) — the conv then reads RAW x
    from HBM and the normalized tensor never exists there.
    `residual` (B, H, W, Cout) is added to the output inside the kernel
    (the resnet skip connection) — one HBM read instead of the separate
    add pass's read + read + write.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    assert (kh, kw) == (3, 3), "halo_conv is specialized to 3x3"
    bh = block_h or pick_block_h(h, w, cin, cout, x.dtype.itemsize)
    assert bh is not None and h % bh == 0, (h, bh)
    # Mosaic requires DMA slice extents on tiled dims (sublane 8, lane
    # 128) to be tile-aligned even in HBM: pad the W halo to a multiple
    # of 8 and Cin to a multiple of 128. The zero channels multiply zero
    # weight rows, so the math is unchanged; the kernel only ever reads
    # columns [dx, dx + w). One fused XLA pad pass covers H/W/C at once.
    wp = w + 2 + (-(w + 2)) % 8
    cinp = cin + (-cin) % 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, cinp - cin)))
    w9 = jnp.pad(kernel, ((0, 0), (0, 0), (0, cinp - cin), (0, 0))) \
        .reshape(9, cinp, cout).astype(x.dtype)
    # Per-batch vectors ride as (N, 1, C) with block (1, 1, C): Mosaic
    # requires the block's last two dims to be tile-divisible OR equal to
    # the array dims — (1, C) blocks over an (N, C) array violate the
    # sublane rule whenever N > 1.
    if bias is None:
        b2 = jnp.zeros((1, 1, cout), x.dtype)
    else:
        b2 = bias.reshape(-1, 1, cout)      # (1|B, 1, Cout)
    bias_ix = (lambda bb, ii: (bb, 0, 0)) if b2.shape[0] == b \
        else (lambda bb, ii: (0, 0, 0))
    if prologue is not None:
        a, s = prologue
        a2 = jnp.pad(a.astype(jnp.float32).reshape(b, 1, cin),
                     ((0, 0), (0, 0), (0, cinp - cin)))
        s2 = jnp.pad(s.astype(jnp.float32).reshape(b, 1, cin),
                     ((0, 0), (0, 0), (0, cinp - cin)))
    else:
        # dummies (never read: `fused` is static)
        a2 = jnp.zeros((1, 1, cinp), jnp.float32)
        s2 = jnp.zeros((1, 1, cinp), jnp.float32)
    aff_ix = (lambda bb, ii: (bb, 0, 0)) if a2.shape[0] == b \
        else (lambda bb, ii: (0, 0, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),             # xp stays in HBM
        pl.BlockSpec((9, cinp, cout), lambda bb, ii: (0, 0, 0)),
        pl.BlockSpec((1, 1, cout), bias_ix),
        pl.BlockSpec((1, 1, cinp), aff_ix),
        pl.BlockSpec((1, 1, cinp), aff_ix),
    ]
    args = [xp, w9, b2, a2, s2]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, bh, w, cout),
                                     lambda bb, ii: (bb, ii, 0, 0)))
        args.append(residual)
    return pl.pallas_call(
        functools.partial(_kernel, bh=bh, w=w, cin=cinp, cout=cout, h=h,
                          wp=wp, fused=prologue is not None,
                          has_res=residual is not None),
        grid=(b, h // bh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, w, cout),
                               lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, wp, cinp), x.dtype),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)


def _down_kernel(ph_ref, w_ref, b_ref, o_ref, slab, sem, *, bho: int,
                 wo: int, cin: int, cout: int, wop: int):
    """Stride-2 3x3 conv over four parity phases of the padded input.

    Tap (dy, dx) reads phase (dy%2, dx%2) at row offset dy//2, col offset
    dx//2 — every slice is a plain contiguous window (no strided VMEM
    access). `ph_ref` stacks the phases as (B, 4, ho+1, wop, cin) in HBM
    — dynamic batch index LEADING, the stable stride-1 kernel's
    `.at[b, ...]` source pattern — and ONE multi-dim DMA fetches all four
    (bho+1)-row phase slabs per grid step. (Two earlier forms — four
    concurrent copies on a shared semaphore, and a phase-leading stack
    with `.at[:, b, ...]` — faulted the chip NONDETERMINISTICALLY across
    compiled programs; see the known-limit note on halo_downconv.)"""
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        ph_ref.at[b, :, pl.ds(i * bho, bho + 1)], slab, sem)
    dma.start()
    dma.wait()
    acc = None
    for dy in range(3):
        for dx in range(3):
            src = slab[2 * (dy % 2) + (dx % 2)]
            xs = src[dy // 2:dy // 2 + bho,
                     dx // 2:dx // 2 + wo].reshape(bho * wo, cin)
            y = jax.lax.dot_general(
                xs, w_ref[3 * dy + dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(bho, wo, cout).astype(o_ref.dtype)


def pick_down_block_h(ho: int, wo: int, cin: int, cout: int,
                      itemsize: int = 2) -> Optional[int]:
    """Output-row slab height for halo_downconv, or None (fall back).

    As in pick_block_h, cout is charged lane-padded (Mosaic pads the last
    dim of VMEM buffers to 128)."""
    wop = wo + 1 + (-(wo + 1)) % 8
    cinp = cin + (-cin) % 128
    coutp = cout + (-cout) % 128
    for bho in (32, 16, 8):
        if ho % bho:
            continue
        need = (4 * (bho + 1) * wop * cinp * itemsize    # phase slabs
                + (bho + 1) * wo * cinp * itemsize       # live view
                + 9 * cinp * coutp * itemsize            # weights
                + 2 * bho * wo * coutp * itemsize        # out blocks
                + bho * wo * coutp * 4)                  # fp32 acc
        if need <= VMEM_BUDGET:
            return bho
    return None


def halo_downconv(x: jax.Array, kernel: jax.Array,
                  bias: Optional[jax.Array] = None,
                  padding="SAME",
                  block_h: Optional[int] = None,
                  interpret: bool = False) -> jax.Array:
    """3x3 stride-2 conv, NHWC/HWIO, arbitrary explicit padding — the
    strided sibling of halo_conv. Forward-only; use downconv3x3 where
    gradients must flow (UNet downsamplers sit on the backprop path to
    upstream trainable params even when frozen themselves).

    The padded input is split into four (row, col) parity phases OUTSIDE
    the kernel (one fused XLA slice pass), so tap (dy,dx) becomes a
    contiguous window of phase (dy%2, dx%2) and the kernel never does a
    strided VMEM access. HBM traffic: one read of x (phase split) + one
    read of the phases + one output write, vs im2col's 2.25x patch
    write + 2.25x read + read (measured 29% of bound at the UNet's
    64x64 s2 site, BENCH.md round 3).

    KNOWN CHIP FAULT — QUARANTINED (r4, jax 0.9.0 / v5e via axon):
    Mosaic-compiled instances of this kernel fault the TPU worker
    NONDETERMINISTICALLY — roughly half of compiled programs crash on
    first execution, the rest run correctly forever (the on-chip
    numerics gate passed it twice). Reproduced across: four per-phase
    DMAs on a shared semaphore, one stacked 4-d DMA (phase-leading and
    batch-leading layouts), single calls, static-bound fori_loop x50,
    and dynamic while_loop; input as constant or traced argument. The
    stride-1 sibling (same scratch/DMA pattern, rank-3 slab) is stable
    under identical stress. Dispatch is therefore DISABLED
    (shift_conv.HALO_DOWN_ENABLED, env STORYGEN_HALO_DOWN=1 to
    re-evaluate on a newer toolchain); strided sites keep the measured
    im2col/shift-GEMM paths. Interpret-mode numerics + the downconv3x3
    VJP remain under test so the kernel is ready if Mosaic fixes it."""
    from storygen_tpu.ops.shift_conv import _norm_padding
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    assert (kh, kw) == (3, 3), "halo_downconv is specialized to 3x3"
    (p0, p1), (q0, q1) = _norm_padding(padding, kh, kw)
    ho = (h + p0 + p1 - 3) // 2 + 1
    wo = (w + q0 + q1 - 3) // 2 + 1
    bho = block_h or pick_down_block_h(ho, wo, cin, cout, x.dtype.itemsize)
    assert bho is not None and ho % bho == 0, (ho, bho)
    cinp = cin + (-cin) % 128
    wop = wo + 1 + (-(wo + 1)) % 8
    # pad so every phase is exactly (ho+1, wo+1) before sublane padding:
    # max row index read is 2*(ho-1)+2 = 2*ho, col likewise
    xp = jnp.pad(x, ((0, 0), (p0, 2 * ho + 2 - h - p0),
                     (q0, 2 * wo + 2 - w - q0), (0, cinp - cin)))
    phases = [xp[:, r::2, c::2][:, :ho + 1, :wo + 1]
              for r in range(2) for c in range(2)]
    phases = jnp.stack(
        [jnp.pad(p, ((0, 0), (0, 0), (0, wop - wo - 1), (0, 0)))
         for p in phases], axis=1)               # (B, 4, ho+1, wop, cinp)
    w9 = jnp.pad(kernel, ((0, 0), (0, 0), (0, cinp - cin), (0, 0))) \
        .reshape(9, cinp, cout).astype(x.dtype)
    b2 = (bias if bias is not None
          else jnp.zeros((cout,), x.dtype)).reshape(1, cout)
    return pl.pallas_call(
        functools.partial(_down_kernel, bho=bho, wo=wo, cin=cinp,
                          cout=cout, wop=wop),
        grid=(b, ho // bho),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # stacked phases
            pl.BlockSpec((9, cinp, cout), lambda bb, ii: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bho, wo, cout),
                               lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, bho + 1, wop, cinp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(phases, w9, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def downconv3x3(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                padding=((1, 1), (1, 1)),
                block_h: Optional[int] = None,
                interpret: bool = False) -> jax.Array:
    """Differentiable halo_downconv (3x3 stride-2, NHWC/HWIO)."""
    return halo_downconv(x, kernel, bias, padding=padding,
                         block_h=block_h, interpret=interpret)


def _downconv3x3_fwd(x, kernel, bias, padding, block_h, interpret):
    return (halo_downconv(x, kernel, bias, padding=padding,
                          block_h=block_h, interpret=interpret),
            (x, kernel, bias))


def _downconv3x3_bwd(padding, block_h, interpret, res, g):
    # Backward via the linearization of the equivalent (exact) strided
    # shift-GEMM formulation: for a linear-in-inputs op the VJP never
    # evaluates the primal, and XLA DCEs the unused forward, so this
    # costs exactly the transpose-conv + 9 strided tap dot_generals.
    del block_h, interpret
    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda xx, kk, bb: shift_conv(xx, kk, bb, stride=2,
                                      padding=padding), x, kernel, bias)
    return vjp(g)


downconv3x3.defvjp(_downconv3x3_fwd, _downconv3x3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3(x: jax.Array, kernel: jax.Array, bias: jax.Array,
            block_h: Optional[int] = None,
            interpret: bool = False) -> jax.Array:
    """Differentiable halo-kernel conv (3x3 stride-1 SAME, NHWC/HWIO)."""
    return halo_conv(x, kernel, bias, block_h=block_h, interpret=interpret)


def _conv3x3_fwd(x, kernel, bias, block_h, interpret):
    return (halo_conv(x, kernel, bias, block_h=block_h,
                      interpret=interpret), (x, kernel, bias.ndim))


def _conv3x3_bwd(block_h, interpret, res, g):
    x, kernel, bias_ndim = res
    del block_h
    # dL/dx: correlate g with the spatially flipped, io-transposed kernel
    # (transpose-conv of a stride-1 SAME 3x3 is itself a SAME 3x3 conv) —
    # i.e. the SAME wide-spatial shape the forward halo kernel won on, so
    # reuse its dispatch predicate with cin/cout swapped (g is the input,
    # x's channel count is the output width).
    k_flip = (kernel[::-1, ::-1].transpose(0, 1, 3, 2)).astype(g.dtype)
    bh_g = halo_block_h(g.shape, (3, 3), "SAME", x.shape[-1],
                        g.dtype.itemsize)
    if bh_g is not None:
        dx = halo_conv(g, k_flip, block_h=bh_g, interpret=interpret)
    else:
        dx = shift_conv(g, k_flip)
    # dL/dw[t]: tap-slice(x_pad)^T . g — contraction over B*H*W.
    b, h, w, cin = x.shape
    cout = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gf = g.reshape(b * h * w, cout)
    dws = []
    for dy in range(3):
        for dxx in range(3):
            xs = jax.lax.slice(
                xp, (0, dy, dxx, 0),
                (b, dy + h, dxx + w, cin)).reshape(b * h * w, cin)
            dws.append(jax.lax.dot_general(
                xs, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    dw = jnp.stack(dws).reshape(3, 3, cin, cout).astype(kernel.dtype)
    db_axes = (1, 2) if bias_ndim == 2 else (0, 1, 2)
    db = g.sum(db_axes).astype(jnp.float32).astype(g.dtype)
    return dx.astype(x.dtype), dw, db


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gnconv3x3(x: jax.Array, a: jax.Array, s: jax.Array,
              kernel: jax.Array, bias: jax.Array,
              block_h: Optional[int] = None,
              interpret: bool = False) -> jax.Array:
    """Differentiable fused GroupNorm-affine+SiLU+3x3-conv.

    Computes conv3x3(silu(x * a + s)) with the affine+SiLU applied to
    the halo slab in VMEM (halo_conv prologue) — the normalized tensor
    never exists in HBM. `a`, `s` are the folded per-batch per-channel
    GroupNorm scale/shift (models/layers.py::GroupNorm fold_affine);
    `bias` is (Cout,) or (B, Cout) (the latter folds the resnet temb
    add). Matches GN(x)->SiLU->Conv2d of diffusers ResnetBlock2D
    (/root/reference/model/unet_2d_blocks.py:5 via resnet.py) exactly.
    """
    return halo_conv(x, kernel, bias, block_h=block_h,
                     interpret=interpret, prologue=(a, s))


def _gnconv3x3_fwd(x, a, s, kernel, bias, block_h, interpret):
    return (gnconv3x3(x, a, s, kernel, bias, block_h, interpret),
            (x, a, s, kernel, bias.ndim))


def _gnconv3x3_bwd(block_h, interpret, res, g):
    """Backward in XLA ops: recompute act = silu(x*a + s) once (fp32),
    chain dL/dact through the flipped-kernel correlation (halo where
    eligible), then the SiLU-affine local derivative."""
    x, a, s, kernel, bias_ndim = res
    b, h, w, cin = x.shape
    cout = g.shape[-1]
    bshape = (b, 1, 1, cin)
    z = (x.astype(jnp.float32) * a.astype(jnp.float32).reshape(bshape)
         + s.astype(jnp.float32).reshape(bshape))
    sig = jax.nn.sigmoid(z)
    act32 = z * sig
    dsilu = sig * (1.0 + z * (1.0 - sig))          # d silu(z)/dz
    # dL/dact: correlate g with the flipped, io-transposed kernel (same
    # formulation as _conv3x3_bwd's dx path).
    k_flip = (kernel[::-1, ::-1].transpose(0, 1, 3, 2)).astype(g.dtype)
    bh_g = halo_block_h(g.shape, (3, 3), "SAME", cin, g.dtype.itemsize)
    if bh_g is not None:
        dact = halo_conv(g, k_flip, block_h=bh_g, interpret=interpret)
    else:
        dact = shift_conv(g, k_flip)
    dz = dact.astype(jnp.float32) * dsilu
    dx = (dz * a.astype(jnp.float32).reshape(bshape)).astype(x.dtype)
    da = (dz * x.astype(jnp.float32)).sum((1, 2)).astype(a.dtype)
    ds = dz.sum((1, 2)).astype(s.dtype)
    # dL/dw[t]: tap-slice(act_pad)^T . g — contraction over B*H*W.
    act = act32.astype(x.dtype)
    ap = jnp.pad(act, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gf = g.reshape(b * h * w, cout)
    dws = []
    for dy in range(3):
        for dxx in range(3):
            xs = jax.lax.slice(
                ap, (0, dy, dxx, 0),
                (b, dy + h, dxx + w, cin)).reshape(b * h * w, cin)
            dws.append(jax.lax.dot_general(
                xs, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    dw = jnp.stack(dws).reshape(3, 3, cin, cout).astype(kernel.dtype)
    db_axes = (1, 2) if bias_ndim == 2 else (0, 1, 2)
    db = g.sum(db_axes).astype(jnp.float32).astype(g.dtype)
    return dx, da, ds, dw, db


gnconv3x3.defvjp(_gnconv3x3_fwd, _gnconv3x3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gnconvres3x3(x: jax.Array, a: jax.Array, s: jax.Array,
                 kernel: jax.Array, bias: jax.Array, residual: jax.Array,
                 block_h: Optional[int] = None,
                 interpret: bool = False) -> jax.Array:
    """gnconv3x3 + in-kernel residual add (the resnet skip): computes
    conv3x3(silu(x*a + s)) + bias + residual with the residual streamed
    through the kernel's BlockSpec pipeline — the bare conv output never
    round-trips HBM for the skip-connection add."""
    return halo_conv(x, kernel, bias, block_h=block_h,
                     interpret=interpret, prologue=(a, s),
                     residual=residual)


def _gnconvres3x3_fwd(x, a, s, kernel, bias, residual, block_h, interpret):
    return (gnconvres3x3(x, a, s, kernel, bias, residual, block_h,
                         interpret),
            (x, a, s, kernel, bias.ndim))


def _gnconvres3x3_bwd(block_h, interpret, res, g):
    # identical to _gnconv3x3_bwd plus d(residual) = g (identity add)
    grads = _gnconv3x3_bwd(block_h, interpret, res, g)
    return grads + (g,)


gnconvres3x3.defvjp(_gnconvres3x3_fwd, _gnconvres3x3_bwd)
