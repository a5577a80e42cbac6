"""8-bit AdamW state: quantization roundtrip, fp32-Adam tracking, and
integration through make_optimizer (reference bnb.optim.AdamW8bit parity,
train_StorySalon_stage2.py:187-196)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from storygen_tpu.configs import TrainConfig
from storygen_tpu.training import optim
from storygen_tpu.training.optim8bit import (adamw_8bit, dequantize_signed,
                                             dequantize_unsigned,
                                             quantize_signed,
                                             quantize_unsigned, QTensor)


def test_quantize_roundtrip():
    rng = np.random.RandomState(0)
    for shape in [(7,), (300,), (16, 33), (2, 3, 5, 7)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        xq = dequantize_signed(quantize_signed(x), shape)
        # per-block absmax int8: error <= absmax/127 per element
        bound = float(jnp.abs(x).max()) / 127.0 + 1e-7
        assert float(jnp.abs(xq - x).max()) <= bound
        u = jnp.abs(x)
        uq = dequantize_unsigned(quantize_unsigned(u), shape)
        assert float(jnp.abs(uq - u).max()) <= float(u.max()) / 255.0 + 1e-7


def test_state_is_int8():
    params = {"w": jnp.ones((600,)), "b": jnp.ones((3, 5))}
    tx = adamw_8bit(1e-3)
    state = tx.init(params)
    assert state.mu["w"].q.dtype == jnp.int8
    assert state.nu["w"].q.dtype == jnp.uint8
    assert state.mu["w"].q.size == 768  # padded to 256-blocks
    assert state.mu["w"].scale.dtype == jnp.float32


def test_tracks_fp32_adamw_on_quadratic():
    """Quantized Adam must reach (near) the same optimum as fp32 AdamW on
    a convex problem — quantization noise shifts steps, not convergence."""
    target = jnp.asarray(np.random.RandomState(1).randn(64).astype(
        np.float32))

    def loss(p):
        return jnp.sum((p["x"] - target) ** 2)

    def run(tx):
        p = {"x": jnp.zeros(64)}
        s = tx.init(p)

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p)
            u, s2 = tx.update(g, s, p)
            return optax.apply_updates(p, u), s2

        for _ in range(300):
            p, s = step(p, s)
        return p

    p8 = run(adamw_8bit(0.05, weight_decay=0.0))
    p32 = run(optax.adamw(0.05, weight_decay=0.0))
    assert float(loss(p8)) < 1e-2
    np.testing.assert_allclose(np.asarray(p8["x"]), np.asarray(p32["x"]),
                               atol=5e-2)


def test_make_optimizer_8bit_flag_and_accumulation():
    cfg = TrainConfig(use_8bit_adam=True, gradient_accumulation_steps=2,
                      learning_rate=1e-2, lr_scheduler="constant",
                      train_steps=10)
    tx = optim.make_optimizer(cfg)
    params = {"w": jnp.ones((300,))}
    state = tx.init(params)

    @jax.jit
    def step(p, s, g):
        u, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, u), s2

    g = {"w": jnp.full((300,), 0.5)}
    p1, s1 = step(params, state, g)
    # first micro-step of a 2-step accumulation: no update applied yet
    np.testing.assert_array_equal(np.asarray(p1["w"]),
                                  np.asarray(params["w"]))
    p2, s2 = step(p1, s1, g)
    assert float(jnp.abs(p2["w"] - params["w"]).max()) > 0

    # int8 moments survive inside MultiSteps state
    leaves = jax.tree.leaves(s2, is_leaf=lambda x: isinstance(x, QTensor))
    assert any(isinstance(l, QTensor) for l in leaves)
