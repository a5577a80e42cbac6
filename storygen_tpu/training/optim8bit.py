"""Block-quantized 8-bit AdamW state (optax transformation).

TPU-native equivalent of the reference's bnb.optim.AdamW8bit
(train_StorySalon_stage2.py:187-196): both Adam moments are stored as
int8 with one fp32 absmax scale per 256-element block (~1.03 bytes per
parameter per moment instead of 4), dequantized/requantized inside the
jitted update. For attn-only finetunes the (trainable, frozen) partition
already shrinks optimizer state more than 8-bit does; this transform
matters for the `full` finetune predicate (training/optim.py), where
fp32 Adam moments of the 0.86B-param UNet would cost ~6.9 GB HBM vs
~1.8 GB quantized.

Quantization scheme: per-block symmetric absmax (m: int8 in [-127, 127];
v >= 0: uint8 in [0, 255]). Simpler than bnb's dynamic-exponent map but
the same storage cost; SD finetuning tolerances are well inside the
quantization noise floor (see tests/test_optim8bit.py convergence test).
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


class QTensor(NamedTuple):
    q: jax.Array       # int8/uint8 (n_blocks, BLOCK)
    scale: jax.Array   # fp32 (n_blocks, 1)


def quantize_signed(x: jax.Array) -> QTensor:
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    blocks = jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    q = jnp.round(blocks / jnp.maximum(scale, 1e-30) * 127.0)
    return QTensor(q.astype(jnp.int8), scale)


def dequantize_signed(t: QTensor, shape) -> jax.Array:
    blocks = t.q.astype(jnp.float32) * (t.scale / 127.0)
    return blocks.reshape(-1)[:math.prod(shape)].reshape(shape)


def quantize_unsigned(x: jax.Array) -> QTensor:
    """For the non-negative second moment: full uint8 range."""
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % BLOCK
    blocks = jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)
    scale = jnp.max(blocks, axis=1, keepdims=True)
    q = jnp.round(blocks / jnp.maximum(scale, 1e-30) * 255.0)
    return QTensor(q.astype(jnp.uint8), scale)


def dequantize_unsigned(t: QTensor, shape) -> jax.Array:
    blocks = t.q.astype(jnp.float32) * (t.scale / 255.0)
    return blocks.reshape(-1)[:math.prod(shape)].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jax.Array
    mu: Any    # pytree of QTensor
    nu: Any    # pytree of QTensor


def adamw_8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 1e-2
               ) -> optax.GradientTransformation:
    """AdamW with int8-quantized moments (state layout above). Drop-in
    for optax.adamw in training/optim.py's chain."""

    def init(params):
        mu = jax.tree.map(lambda p: quantize_signed(jnp.zeros_like(p)),
                          params)
        nu = jax.tree.map(lambda p: quantize_unsigned(jnp.zeros_like(p)),
                          params)
        return Adam8bitState(jnp.zeros((), jnp.int32), mu, nu)

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamw_8bit requires params (weight decay)")
        count = state.count + 1
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        is_q = lambda x: isinstance(x, QTensor)

        def upd(g, p, mq, nq):
            g = g.astype(jnp.float32)
            m = b1 * dequantize_signed(mq, g.shape) + (1 - b1) * g
            n = b2 * dequantize_unsigned(nq, g.shape) + (1 - b2) * g * g
            mhat = m / (1 - b1 ** count)
            nhat = n / (1 - b2 ** count)
            step = mhat / (jnp.sqrt(nhat) + eps) + weight_decay * p
            return (-lr * step).astype(p.dtype), quantize_signed(m), \
                quantize_unsigned(n)

        flat_g, treedef = jax.tree.flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_m = jax.tree.flatten(state.mu, is_leaf=is_q)[0]
        flat_n = jax.tree.flatten(state.nu, is_leaf=is_q)[0]
        out = [upd(g, p, m, n) for g, p, m, n
               in zip(flat_g, flat_p, flat_m, flat_n)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, Adam8bitState(count, mu, nu)

    return optax.GradientTransformation(init, update)
