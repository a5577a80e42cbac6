"""Fused GEGLU+GEMM kernel vs the plain XLA formulation (interpret mode
on CPU; Mosaic-compiled on TPU via scripts/tpu_kernel_check.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storygen_tpu.ops.pallas_geglu import geglu_matmul, supported


def _reference(proj, w, bias):
    n = proj.shape[1] // 2
    value, gate = proj[:, :n], proj[:, n:]
    return (value * jax.nn.gelu(gate, approximate=False)) @ w + bias


@pytest.mark.parametrize("m,n,e", [(256, 512, 320), (512, 1280, 320)])
def test_matches_reference(m, n, e):
    rng = np.random.RandomState(0)
    proj = jnp.asarray(rng.randn(m, 2 * n), jnp.float32)
    w = jnp.asarray(rng.randn(n, e) * 0.02, jnp.float32)
    bias = jnp.asarray(rng.randn(e), jnp.float32)
    assert supported(m, 2 * n)
    out = geglu_matmul(proj, w, bias, interpret=True)
    ref = _reference(proj, w, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gradients_match_reference():
    rng = np.random.RandomState(1)
    m, n, e = 256, 512, 128
    proj = jnp.asarray(rng.randn(m, 2 * n), jnp.float32)
    w = jnp.asarray(rng.randn(n, e) * 0.02, jnp.float32)
    bias = jnp.asarray(rng.randn(e), jnp.float32)
    g = jnp.asarray(rng.randn(m, e), jnp.float32)

    def f_kernel(proj, w, bias):
        return (geglu_matmul(proj, w, bias, interpret=True) * g).sum()

    def f_ref(proj, w, bias):
        return (_reference(proj, w, bias) * g).sum()

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(proj, w, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(proj, w, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_unsupported_shapes_fall_back():
    rng = np.random.RandomState(2)
    proj = jnp.asarray(rng.randn(100, 2 * 96), jnp.float32)  # m % 128 != 0
    w = jnp.asarray(rng.randn(96, 64) * 0.1, jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    out = geglu_matmul(proj, w, bias, interpret=True)
    ref = _reference(proj, w, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
