"""Shift-GEMM / im2col conv formulations: exactness vs lax.conv (fwd +
grad), SConv param-layout parity with nn.Conv."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.ops import shift_conv as SC


def _ref_conv(x, k, b, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride) if isinstance(stride, int) else stride,
        padding if padding in ("SAME", "VALID") else
        tuple((int(a), int(c)) for a, c in padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b if b is not None else y


@pytest.mark.parametrize("fn", [SC.shift_conv, SC.im2col_conv])
@pytest.mark.parametrize("kh,kw,stride,padding", [
    (3, 3, 1, ((1, 1), (1, 1))),
    (3, 3, 2, ((1, 1), (1, 1))),
    (1, 1, 1, "VALID"),
    (2, 2, 1, ((1, 0), (0, 1))),   # upsampler phase-conv padding
    (3, 3, 1, "SAME"),
    (3, 3, 1, "VALID"),
])
def test_matches_lax_conv(fn, kh, kw, stride, padding):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 10, 7).astype(np.float32))
    k = jnp.asarray(rng.randn(kh, kw, 7, 5).astype(np.float32))
    b = jnp.asarray(rng.randn(5).astype(np.float32))
    out = fn(x, k, b, stride, padding)
    ref = _ref_conv(x, k, b, stride, padding)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_lax_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))

    def loss(fn, x, k):
        return (fn(x, k, None, 1, ((1, 1), (1, 1))) * g).sum()

    gx_s, gk_s = jax.grad(lambda x, k: loss(SC.shift_conv, x, k),
                          argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(lambda x, k: loss(_ref_conv_nb, x, k),
                          argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_s), np.asarray(gk_r),
                               rtol=1e-5, atol=1e-5)


def _ref_conv_nb(x, k, b, stride, padding):
    return _ref_conv(x, k, None, stride, padding)


def test_sconv_param_layout_and_values_match_nn_conv():
    """SConv must be a drop-in for nn.Conv: same param names/shapes, same
    output on the lax.conv path (CPU)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 5))
    a = SC.SConv(7, (3, 3), padding=((1, 1), (1, 1)), name="conv")
    b = nn.Conv(7, (3, 3), padding=((1, 1), (1, 1)), name="conv")
    pa = a.init(rng, x)
    pb = b.init(rng, x)
    sa = jax.tree.map(lambda t: t.shape, pa)
    sb = jax.tree.map(lambda t: t.shape, pb)
    assert sa == sb
    # identical params -> identical output (CPU falls to lax.conv)
    np.testing.assert_allclose(np.asarray(a.apply(pb, x)),
                               np.asarray(b.apply(pb, x)),
                               rtol=1e-5, atol=1e-5)


def test_strided_shapes():
    x = jnp.zeros((1, 64, 64, 8))
    k = jnp.zeros((3, 3, 8, 16))
    for fn in (SC.shift_conv, SC.im2col_conv):
        assert fn(x, k, None, 2, ((1, 1), (1, 1))).shape == (1, 32, 32, 16)


def test_sconv_prologue_and_extra_bias_fallback():
    # CPU path: prologue applied as the XLA silu-affine, extra_bias as a
    # per-batch add — must equal GroupNorm-style silu(x*a+s) -> conv -> +eb.
    rng = jax.random.PRNGKey(2)
    b, c, co = 2, 6, 7
    x = jax.random.normal(jax.random.PRNGKey(3), (b, 8, 8, c))
    a = jax.random.uniform(jax.random.PRNGKey(4), (b, c)) + 0.5
    s = jax.random.normal(jax.random.PRNGKey(5), (b, c)) * 0.3
    eb = jax.random.normal(jax.random.PRNGKey(6), (b, co))
    m = SC.SConv(co, (3, 3), padding=((1, 1), (1, 1)), name="conv")
    p = m.init(rng, x)
    got = m.apply(p, x, prologue=(a, s), extra_bias=eb)
    z = (x * a[:, None, None, :] + s[:, None, None, :])
    ref = m.apply(p, z * jax.nn.sigmoid(z)) + eb[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_groupnorm_fold_affine_matches_direct():
    from storygen_tpu.models.layers import GroupNorm
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 8)) * 3 + 1
    direct = GroupNorm(num_groups=4, act="silu")
    folded = GroupNorm(num_groups=4, fold_affine=True)
    p = direct.init(jax.random.PRNGKey(8), x)
    a, s = folded.apply(p, x)
    assert a.shape == (2, 8) and s.shape == (2, 8)
    z = x * a[:, None, None, :] + s[:, None, None, :]
    np.testing.assert_allclose(np.asarray(z * jax.nn.sigmoid(z)),
                               np.asarray(direct.apply(p, x)),
                               rtol=1e-5, atol=1e-5)


def test_halo_fused_prologue_is_opt_in():
    # The in-kernel GN+SiLU prologue measured 0.94-0.97x of the XLA
    # prologue on chip (BENCH.md r4 study) — the default must stay the
    # unfused dispatch, with fusion behind STORYGEN_HALO_FUSED=1.
    assert SC.HALO_FUSED is False
    # The fused eligibility charges the prologue's fp32 row-chunk
    # temporaries, so at a fixed site it can never allow a TALLER slab
    # than the unfused form.
    shape = (9, 64, 64, 320)
    bh_plain = SC.halo_block_h(shape, (3, 3), "SAME", 320, 2)
    bh_fused = SC.halo_block_h(shape, (3, 3), "SAME", 320, 2, fused=True)
    assert bh_plain is not None
    assert bh_fused is None or bh_fused <= bh_plain


def test_fused_dispatch_casts_input_to_module_dtype(monkeypatch):
    """ADVICE r4: the STORYGEN_HALO_FUSED=1 path must hand the fused
    kernels x cast to the module dtype (mirroring the unfused conv3x3's
    xin cast). An fp32 x under a bf16 policy would silently run the
    kernel fp32 (numerics/VMEM diverge from the unfused dispatch) and
    break the custom VJP: db comes back in the cotangent dtype (fp32)
    against a bf16 beff primal."""
    from storygen_tpu.ops import pallas_conv as PC
    monkeypatch.setattr(SC, "HALO_FUSED", True)
    monkeypatch.setattr(SC, "_on_tpu", lambda: True)
    seen = {}

    def fake_gnconv3x3(x, a, s, k, beff, bh, interpret=False):
        seen["x"] = x.dtype
        seen["beff"] = beff.dtype
        bsh = (x.shape[0], 1, 1, x.shape[-1])
        z = (x.astype(jnp.float32) * a.reshape(bsh) + s.reshape(bsh))
        act = (z * jax.nn.sigmoid(z)).astype(x.dtype)
        y = SC.shift_conv(act, k).astype(jnp.float32)
        return (y + beff.astype(jnp.float32).reshape(
            (beff.shape[0], 1, 1, -1) if beff.ndim == 2
            else (1, 1, 1, -1))).astype(x.dtype)

    monkeypatch.setattr(PC, "gnconv3x3", fake_gnconv3x3)
    m = SC.SConv(features=64, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 64),
                          jnp.float32)  # fp32 input under bf16 policy
    a = jnp.ones((1, 64), jnp.float32)
    s = jnp.zeros((1, 64), jnp.float32)
    p = m.init(jax.random.PRNGKey(1), x, prologue=(a, s))
    out = m.apply(p, x, prologue=(a, s))
    assert seen["x"] == jnp.bfloat16
    assert seen["beff"] == jnp.bfloat16
    assert out.dtype == jnp.bfloat16


@pytest.mark.parametrize("form", ["phase", "s2d"])
@pytest.mark.parametrize("h,w,cin,cout,pad", [
    (64, 64, 16, 24, "SAME"),                  # UNet downsample shape
    (33, 33, 8, 8, ((0, 0), (0, 0))),          # VAE enc pre-padded VALID
    (20, 12, 8, 16, ((0, 1), (0, 1))),         # asymmetric pad in-place
    (16, 16, 8, 8, ((1, 1), (1, 1))),
])
def test_stride2_phase_formulations_exact(form, h, w, cin, cout, pad):
    """phase_conv / s2d_conv == lax.conv stride-2 (fp32, exact up to
    accumulation reassociation) across the model's padding conventions.
    NOTE "SAME" here means the module's torch-pad=1 convention
    (_norm_padding), NOT XLA's stride-2 SAME ((0,1)); normalize the
    reference the same way."""
    from storygen_tpu.ops.shift_conv import (_norm_padding, phase_conv,
                                             s2d_conv)
    kx, kk = jax.random.split(jax.random.PRNGKey(42))
    x = jax.random.normal(kx, (2, h, w, cin), jnp.float32)
    k = jax.random.normal(kk, (3, 3, cin, cout), jnp.float32) * 0.1
    bias = jnp.linspace(-1, 1, cout, dtype=jnp.float32)
    fn = phase_conv if form == "phase" else s2d_conv
    got = fn(x, k, bias, padding=pad)
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), _norm_padding(pad, 3, 3),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stride2_dispatch_rule(monkeypatch):
    """r5 measured 3x3-s2 dispatch (scripts/studies/bench_s2d_conv.py):
    phase_conv for the deep narrow-spatial band (cin>=512, <=10M input
    elements), XLA native conv elsewhere; im2col never for 3x3 s2. All
    branches exact vs lax.conv under the torch padding convention."""
    calls = []
    real_phase = SC.phase_conv
    real_im2col = SC.im2col_conv
    real_native = jax.lax.conv_general_dilated

    monkeypatch.setattr(SC, "_on_tpu", lambda: True)
    monkeypatch.setattr(SC, "phase_conv",
                        lambda *a, **k: (calls.append("phase"),
                                         real_phase(*a, **k))[1])
    monkeypatch.setattr(SC, "im2col_conv",
                        lambda *a, **k: (calls.append("im2col"),
                                         real_im2col(*a, **k))[1])
    monkeypatch.setattr(
        jax.lax, "conv_general_dilated",
        lambda *a, **k: (calls.append("native"),
                         real_native(*a, **k))[1])

    def run(b, h, cin, cout, pad):
        m = SC.SConv(features=cout, strides=(2, 2), padding=pad)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(b, h, h, cin).astype(np.float32))
        p = m.init(jax.random.PRNGKey(0), x)
        calls.clear()
        y = m.apply(p, x)
        want = real_native(
            x, p["params"]["kernel"], (2, 2),
            SC._norm_padding(pad, 3, 3),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) \
            + p["params"]["bias"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        return calls[0]

    sym = ((1, 1), (1, 1))
    # L3/L2 down band and VAE enc 128px: phase
    assert run(2, 16, 640, 640, sym) == "phase"
    assert run(1, 16, 1280, 1280, sym) == "phase"
    # wide or shallow sites: native (the old im2col lost 3x here)
    assert run(2, 64, 320, 320, sym) == "native"
    assert run(1, 64, 256, 256, sym) == "native"
    # batched deep site past the 10M-element band: native
    assert run(16, 64, 512, 512, sym) == "native"
    assert "im2col" not in calls
