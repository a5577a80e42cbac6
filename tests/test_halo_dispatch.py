"""SConv halo-kernel dispatch predicate (ops/shift_conv.halo_block_h).

The dispatch itself is TPU-gated; this pins the measured eligibility
table from scripts/bench_halo_conv.py so a refactor cannot silently
route a losing site to the kernel (or un-route a winning one). The
model padding convention is the explicit ((1,1),(1,1)) tuple, not
"SAME" — both must dispatch.
"""
import jax.numpy as jnp

from storygen_tpu.ops.shift_conv import halo_block_h

PAD = ((1, 1), (1, 1))


def _bh(b, h, w, cin, cout, padding=PAD, k=(3, 3)):
    return halo_block_h((b, h, w, cin), k, padding, cout, 2)


def test_unet_l1_sites_dispatch():
    # every 64x64 UNet site won on chip (1.08-1.63x)
    for (cin, cout) in [(320, 320), (640, 320), (960, 320), (640, 640)]:
        assert _bh(9, 64, 64, cin, cout) is not None
        assert _bh(3, 64, 64, cin, cout) is not None


def test_unet_l2plus_sites_stay_on_shift():
    # 32x32 and deeper sites measured 0.92-0.97x — must NOT dispatch
    for (h, cin, cout) in [(32, 640, 640), (32, 320, 640),
                           (32, 1280, 640), (16, 1280, 1280),
                           (8, 1280, 1280)]:
        assert _bh(9, h, h, cin, cout) is None


def test_vae_decoder_sites():
    assert _bh(1, 512, 512, 128, 128) is not None     # 5.75x winner
    assert _bh(1, 256, 256, 256, 256) is not None     # 1.94x winner
    assert _bh(1, 128, 128, 512, 512) is None         # 0.92x loser


def test_model_padding_tuple_and_same_both_dispatch():
    assert _bh(9, 64, 64, 320, 320, padding=PAD) is not None
    assert _bh(9, 64, 64, 320, 320, padding="SAME") is not None
    assert _bh(9, 64, 64, 320, 320, padding="VALID") is None


def test_non_3x3_never_dispatches():
    assert _bh(9, 64, 64, 320, 320, k=(1, 1)) is None
    assert _bh(9, 64, 64, 320, 320, k=(5, 5)) is None


def test_strided_dispatch_quarantined_by_default():
    """halo_downconv faults the chip nondeterministically (known fault,
    ops/pallas_conv.py) — the strided dispatch must stay OFF unless
    STORYGEN_HALO_DOWN=1 opts in."""
    from storygen_tpu.ops import shift_conv as sc
    assert not sc.HALO_DOWN_ENABLED
    assert sc.down_halo_block_h((9, 64, 64, 320), (3, 3), (2, 2), PAD,
                                320, 2) is None


def test_strided_dispatch_table(monkeypatch):
    from storygen_tpu.ops import shift_conv as sc
    from storygen_tpu.ops.shift_conv import down_halo_block_h
    # the table below is the opt-in behavior (STORYGEN_HALO_DOWN=1)
    monkeypatch.setattr(sc, "HALO_DOWN_ENABLED", True)
    dn = lambda b, h, cin, cout, pad: down_halo_block_h(
        (b, h, h, cin), (3, 3), (2, 2), pad, cout, 2)
    # UNet L1 downsample (symmetric pad) dispatches; L2/L3 stay put
    assert dn(9, 64, 320, 320, PAD) is not None
    assert dn(9, 32, 640, 640, PAD) is None
    assert dn(9, 16, 1280, 1280, PAD) is None
    # VAE encoder sites arrive pre-padded (h+1, VALID): 512/256px
    # dispatch, the flop-dense 128px cin>=512 band stays on im2col
    VALID = ((0, 0), (0, 0))
    assert dn(1, 513, 128, 128, VALID) is not None
    assert dn(1, 257, 256, 256, VALID) is not None
    assert dn(1, 129, 512, 512, VALID) is None
    # stride-1 and non-3x3 never take the strided path
    assert down_halo_block_h((9, 64, 64, 320), (3, 3), (1, 1), PAD,
                             320, 2) is None
    assert down_halo_block_h((9, 64, 64, 320), (1, 1), (2, 2), PAD,
                             320, 2) is None


def test_sconv_on_cpu_unaffected():
    # off-TPU SConv must keep producing nn.Conv semantics regardless of
    # the predicate (the halo path is _on_tpu()-gated)
    import numpy as np
    from storygen_tpu.ops.shift_conv import SConv
    import jax
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 8),
                    jnp.float32)
    m = SConv(features=8, kernel_size=(3, 3), padding=PAD)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 64, 64, 8)
    assert bool(jnp.isfinite(y).all())


def test_pick_block_h_consistent_with_vmem_need_model():
    """pick_block_h must accept exactly per the exposed vmem_need model
    (the on-chip vmem_ceiling gate in scripts/tpu_kernel_check.py relies
    on this equivalence to find the highest-modeled site)."""
    from storygen_tpu.ops.pallas_conv import (VMEM_BUDGET, pick_block_h,
                                              vmem_need)
    cases = [(64, 64, 320, 320, False), (64, 64, 960, 320, False),
             (512, 512, 128, 128, False), (256, 256, 256, 256, True),
             (512, 512, 128, 128, True), (64, 64, 640, 640, True),
             (256, 256, 128, 256, False)]
    for (h, w, cin, cout, fz) in cases:
        bh = pick_block_h(h, w, cin, cout, 2, fused=fz)
        if bh is None:
            assert all(vmem_need(c, h, w, cin, cout, 2, fused=fz)
                       > VMEM_BUDGET for c in (32, 16, 8) if h % c == 0)
            continue
        assert vmem_need(bh, h, w, cin, cout, 2, fused=fz) <= VMEM_BUDGET
        # it picked the LARGEST fitting slab
        for cand in (32, 16):
            if cand > bh and h % cand == 0:
                assert (vmem_need(cand, h, w, cin, cout, 2, fused=fz)
                        > VMEM_BUDGET)
