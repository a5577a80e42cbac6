"""Flash-attention kernel correctness vs the XLA reference path
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.ops.attention import xla_attention
from storygen_tpu.ops.pallas_attention import (flash_attention,
                                               flash_supported)


@pytest.mark.parametrize("variant", ["grid", "online_t", "bnd", "bnd_guard"])
@pytest.mark.parametrize("sq,skv,d", [
    (256, 256, 40),    # self-attn shape (reduced)
    (256, 768, 40),    # attn3 with 3-ref kv concat
    (512, 256, 80),
])
def test_matches_xla(sq, skv, d, variant):
    rng = np.random.RandomState(0)
    b, h = 2, 2
    q = jnp.asarray(rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    scale = d ** -0.5
    ref = xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                          interpret=True, variant=variant)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


@pytest.mark.parametrize("variant", ["online_t", "bnd", "bnd_guard"])
def test_variant_grads_and_mask(variant):
    """Transposed-forward variants: gradients + block mask vs XLA."""
    rng = np.random.RandomState(7)
    b, h, sq, skv, d = 2, 2, 256, 768, 40
    q = jnp.asarray(rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    g = jnp.asarray(rng.randn(b, h, sq, d), dtype=jnp.float32)
    scale = d ** -0.5
    bm = jnp.asarray([[1.0, 0.0, 1.0], [1.0, 1.0, 0.0]])
    mask = jnp.repeat(bm.astype(bool), skv // 3, axis=1)[:, None, None, :]

    out = flash_attention(q, k, v, scale=scale, block_q=128, block_k=256,
                          interpret=True, variant=variant, block_mask=bm)
    ref = xla_attention(q, k, v, scale, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)

    def floss(q, k, v):
        return (flash_attention(q, k, v, scale=scale, block_q=128,
                                block_k=256, interpret=True,
                                variant=variant) * g).sum()

    def rloss(q, k, v):
        return (xla_attention(q, k, v, scale) * g).sum()

    gs = jax.grad(floss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(rloss, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=5e-3,
                                   atol=5e-3)


def test_bnd_validity_domain():
    """The stats-free "bnd" variant is exact while logits stay inside the
    fp32 exp2 range below its Cauchy-Schwarz row bound; amplified inputs
    leave that domain (documented), online_t stays exact there."""
    rng = np.random.RandomState(3)
    b, h, sq, skv, d = 1, 1, 128, 256, 40
    q = jnp.asarray(8 * rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(8 * rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    scale = d ** -0.5
    ref = xla_attention(q, k, v, scale)
    exact = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                            interpret=True, variant="online_t")
    np.testing.assert_allclose(np.asarray(exact), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_bnd_guard_exact_past_raw_domain():
    """"bnd_guard" clamps the bound's deviation term at 120 exp2-units;
    the softmax ratio is invariant to the bound, so the kernel stays
    EXACT even when the clamp engages (dev in (120, ~240)) — the regime
    where the raw "bnd" kernel already drifts toward silent underflow."""
    rng = np.random.RandomState(3)
    b, h, sq, skv, d = 1, 1, 128, 256, 40
    # amplitude 4.5: dev = |q'| * max|k - k_mean| lands in ~(120, 240)
    q = jnp.asarray(4.5 * rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(4.5 * rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    scale = d ** -0.5
    from storygen_tpu.ops.pallas_attention import _bnd_domain_ok, LOG2E
    assert not bool(_bnd_domain_ok(q * (scale * LOG2E), k))
    ref = xla_attention(q, k, v, scale)
    guarded = flash_attention(q, k, v, scale=scale, block_q=128,
                              block_k=128, interpret=True,
                              variant="bnd_guard")
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_bnd_guard_masked_ignores_dropped_block_stats():
    """The guarded bound must be computed over KEPT kv blocks only: a
    dropped block with a far-off key cluster would otherwise hoist the
    centroid bound above every kept logit and silently underflow the
    kept rows. (Training's random 1-3-ref kv masking is exactly this
    shape.)"""
    rng = np.random.RandomState(11)
    b, h, sq, skv, d = 1, 2, 128, 384, 40
    q = jnp.asarray(rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = np.asarray(rng.randn(b, h, skv, d), np.float32)
    # dropped middle block: keys pushed 300 sigma away from the kept ones
    k[:, :, 128:256, :] += 300.0
    k = jnp.asarray(k)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    scale = d ** -0.5
    bm = jnp.asarray([[1.0, 0.0, 1.0]])
    mask = jnp.repeat(bm.astype(bool), skv // 3, axis=1)[:, None, None, :]
    ref = xla_attention(q, k, v, scale, mask=mask)
    out = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                          interpret=True, variant="bnd_guard",
                          block_mask=bm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_bnd_guard_fails_loud_beyond_overflow():
    """Far beyond the clamp's exact range the row sum overflows to inf
    and the output goes NaN — a LOUD failure. The raw "bnd" kernel on
    the same input silently underflows rows toward zero (the ADVICE-r2
    hazard the guard exists to remove)."""
    rng = np.random.RandomState(3)
    b, h, sq, skv, d = 1, 1, 128, 256, 40
    q = jnp.asarray(60 * rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(60 * rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    scale = d ** -0.5
    guarded = flash_attention(q, k, v, scale=scale, block_q=128,
                              block_k=128, interpret=True,
                              variant="bnd_guard")
    assert not np.isfinite(np.asarray(guarded)).all()
    ref = xla_attention(q, k, v, scale)
    raw = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                          interpret=True, variant="bnd")
    assert np.isfinite(np.asarray(raw)).all()  # silent, not loud...
    assert np.abs(np.asarray(raw)).max() < np.abs(np.asarray(ref)).max()


def test_bnd_guard_uses_fast_path_in_domain():
    """On in-domain inputs the deviation clamp is a no-op, so bnd_guard
    runs the identical bounded kernel and matches raw "bnd"."""
    rng = np.random.RandomState(5)
    b, h, sq, skv, d = 1, 2, 128, 256, 40
    q = jnp.asarray(rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    scale = d ** -0.5
    from storygen_tpu.ops.pallas_attention import _bnd_domain_ok, LOG2E
    assert bool(_bnd_domain_ok(q * (scale * LOG2E), k))
    kw = dict(scale=scale, block_q=128, block_k=128, interpret=True)
    guarded = flash_attention(q, k, v, variant="bnd_guard", **kw)
    raw = flash_attention(q, k, v, variant="bnd", **kw)
    # same kernel modulo lax.cond branch fusion (not bitwise identical)
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(raw),
                               rtol=1e-5, atol=1e-6)


def test_bf16_io():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 256, 40), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 2, 256, 40), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 2, 256, 40), dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, scale=0.16, block_q=128, block_k=128,
                          interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), 0.16)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)


def test_numerically_stable_large_logits():
    """Online softmax must survive large score magnitudes."""
    q = jnp.full((1, 1, 128, 40), 10.0)
    k = jnp.full((1, 1, 256, 40), 10.0)
    v = jnp.ones((1, 1, 256, 40))
    out = flash_attention(q, k, v, scale=1.0, block_q=128, block_k=128,
                          interpret=True)
    # uniform attention over identical keys -> output == v
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


def test_flash_supported_gating():
    assert flash_supported(4096, 4096, has_mask=False)
    assert flash_supported(4096, 12288, has_mask=False)
    assert not flash_supported(4096, 4096, has_mask=True)
    assert not flash_supported(64, 77, has_mask=False)   # text cross-attn
    assert not flash_supported(4096, 77, has_mask=False)  # kv too small


def test_flash_is_differentiable():
    """custom VJP: grads match the XLA attention path."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 2, 128, 16), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 256, 16), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 256, 16), dtype=jnp.float32)
    scale = 0.25

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale, block_q=128,
                                       block_k=128, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3)


def test_block_mask_matches_xla_ref_mask():
    """Flash block mask == XLA elementwise ref mask (interpret mode)."""
    rng = np.random.RandomState(4)
    b, h, sq, d, n = 2, 2, 128, 16, 2
    skv = 256  # 2 refs x 128 span
    q = jnp.asarray(rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    scale = 0.25
    ref_mask = jnp.asarray([[True, False], [True, True]])
    # flash with block mask (bk=128 tiles each 128-wide ref span)
    bm = ref_mask.astype(jnp.float32)
    out = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                          interpret=True, block_mask=bm)
    kv_mask = jnp.repeat(ref_mask, skv // n, axis=1)[:, None, None, :]
    expected = xla_attention(q, k, v, scale, mask=kv_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_block_mask_gradients_match():
    rng = np.random.RandomState(5)
    b, h, sq, d = 1, 2, 128, 16
    skv = 256
    q = jnp.asarray(rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    bm = jnp.asarray([[1.0, 0.0]])
    kv_mask = jnp.repeat(bm.astype(bool), 128, axis=1)[:, None, None, :]

    gf = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, scale=0.25, block_q=128, block_k=128, interpret=True,
        block_mask=bm) ** 2), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(xla_attention(
        q, k, v, 0.25, mask=kv_mask) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3,
                                   atol=2e-3)


@pytest.mark.parametrize("variant", ["grid", "online_t", "bnd", "bnd_guard"])
def test_out_layout_bhds(variant):
    """out_layout="bhds" returns the exact transpose of the default
    layout, forward and backward (the head-merge-fold path used by
    CrossAttention's output projection)."""
    rng = np.random.RandomState(3)
    b, h, sq, skv, d = 2, 2, 256, 512, 40
    q = jnp.asarray(rng.randn(b, h, sq, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, skv, d), dtype=jnp.float32)
    scale = d ** -0.5
    kw = dict(scale=scale, block_q=128, block_k=128, interpret=True,
              variant=variant)
    ref = flash_attention(q, k, v, **kw)
    out_t = flash_attention(q, k, v, out_layout="bhds", **kw)
    np.testing.assert_allclose(np.asarray(out_t.transpose(0, 1, 3, 2)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)

    g = jnp.asarray(rng.randn(b, h, d, sq), dtype=jnp.float32)

    def f_t(q, k, v):
        return (flash_attention(q, k, v, out_layout="bhds", **kw) * g).sum()

    def f_s(q, k, v):
        return (flash_attention(q, k, v, **kw)
                * g.transpose(0, 1, 3, 2)).sum()

    gt = jax.grad(f_t, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(f_s, argnums=(0, 1, 2))(q, k, v)
    for a, e in zip(gt, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-3, atol=2e-3)


def test_mha_auto_layout_is_tagged_tuple():
    """multi_head_attention out_layout="auto" always returns an
    (array, layout) tuple; "seq" returns the array alone; "feat" was
    removed from the surface (monomorphic return types)."""
    from storygen_tpu.ops.attention import multi_head_attention
    rng = np.random.RandomState(4)
    b, s, hd = 2, 64, 80
    q = jnp.asarray(rng.randn(b, s, hd), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, s, hd), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, s, hd), dtype=jnp.float32)
    seq = multi_head_attention(q, k, v, 2)
    assert seq.shape == (b, s, hd)
    auto, layout = multi_head_attention(q, k, v, 2, out_layout="auto")
    assert layout in ("seq", "feat")
    if layout == "seq":
        np.testing.assert_allclose(np.asarray(auto), np.asarray(seq),
                                   rtol=1e-6, atol=1e-6)
    else:
        np.testing.assert_allclose(np.asarray(auto.transpose(0, 2, 1)),
                                   np.asarray(seq), rtol=1e-5, atol=1e-5)
    with pytest.raises(AssertionError):
        multi_head_attention(q, k, v, 2, out_layout="feat")
