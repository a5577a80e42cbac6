"""Fused GEGLU -> output-projection GEMM (Pallas TPU).

The transformer feed-forward is net_0 (Dense dim -> 2*inner), a GEGLU gate
value * gelu(gate), then net_2 (Dense inner -> dim)
(reference model/attention.py:305-393). At 512px the L1 intermediate is
(9*4096, 2*1280) bf16 — ~190 MB. XLA either fuses the gate into net_2's
GEMM operand (re-reading the intermediate once per output column tile,
measured 38 TF/s on the net_2 dot) or, with an optimization barrier,
materializes the gated product as an extra full HBM pass (~0.7 ms/step per
L1 site). This kernel streams the projection once: each (BM, BN) tile of
value/gate is gated on the VPU in VMEM and immediately consumed by the
MXU accumulating into the (BM, E) output block — the gated product never
exists in HBM. The value and gate tiles are fetched from the SAME (M, 2N)
array through two BlockSpecs (offset index maps), so no slice copies
either.

Grid (M/BM, N/BN), N innermost; fp32 accumulator scratch; exact
(erf-based) gelu matching torch.nn.functional.gelu / diffusers GEGLU.

Backward recomputes through plain XLA ops (the kernel is forward-only;
training pays one re-gating pass, like the barrier formulation)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Gate for models/attention.FeedForward routing (shape checks live there).
ENABLED = True


def _erf(x):
    """erf for the Mosaic kernel (no erf/erfc primitive lowering):
    Abramowitz & Stegun 7.1.26 rational approximation, max abs error
    1.5e-7 — three decades below bf16 output resolution, so the fused
    gelu is indistinguishable from the exact erf formulation at the
    model's compute precision."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _geglu_kernel(v_ref, g_ref, w_ref, b_ref, o_ref, acc_ref, *,
                  n_blocks: int):
    nj = pl.program_id(1)

    @pl.when(nj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gate = g_ref[:].astype(jnp.float32)
    act = gate * (0.5 * (1.0 + _erf(gate * (2.0 ** -0.5))))
    gated = v_ref[:].astype(jnp.float32) * act
    acc_ref[:] += jax.lax.dot_general(
        gated.astype(w_ref.dtype), w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BM, E)

    @pl.when(nj == n_blocks - 1)
    def _fin():
        o_ref[:] = (acc_ref[:] + b_ref[0].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def _pick(size, preferred):
    for b in (preferred, 1024, 512, 256, 128):
        if b <= size and size % b == 0:
            return b
    return None


def supported(m: int, n2: int) -> bool:
    return (n2 % 2 == 0 and _pick(m, 512) is not None
            and _pick(n2 // 2, 512) is not None)


def _reference(proj, w, bias):
    n = proj.shape[1] // 2
    value, gate = proj[:, :n], proj[:, n:]
    gated = value * jax.nn.gelu(gate, approximate=False)
    return (gated @ w + bias).astype(proj.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnames=("interpret",))
def geglu_matmul(proj: jax.Array, w: jax.Array, bias: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """(M, 2N) proj = [value | gate], w (N, E), bias (E,) -> (M, E) =
    (value * gelu(gate)) @ w + bias, with the gated product kept in VMEM.
    """
    m, n2 = proj.shape
    n = n2 // 2
    e = w.shape[1]
    bm = _pick(m, 512)
    bn = _pick(n, 512)
    if bm is None or bn is None:
        return _reference(proj, w, bias)
    n_blocks = n // bn
    gate_off = n // bn  # gate tiles start this many BN-blocks in

    out = pl.pallas_call(
        functools.partial(_geglu_kernel, n_blocks=n_blocks),
        grid=(m // bm, n_blocks),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            pl.BlockSpec((bm, bn),
                         lambda i, j, go=gate_off: (i, j + go)),
            pl.BlockSpec((bn, e), lambda i, j: (j, 0)),
            pl.BlockSpec((1, e), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, e), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, e), proj.dtype),
        scratch_shapes=[pltpu.VMEM((bm, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(proj, proj, w, bias.reshape(1, e))
    return out


def _fwd(proj, w, bias, interpret):
    return geglu_matmul(proj, w, bias, interpret), (proj, w, bias)


def _bwd(interpret, res, g):
    proj, w, bias = res
    n = proj.shape[1] // 2
    value = proj[:, :n].astype(jnp.float32)
    gate = proj[:, n:].astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(gate / jnp.sqrt(2.0)))
    act = gate * cdf                                     # gelu(gate)
    gf = g.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    dw = (value * act).T @ gf
    dbias = gf.sum(axis=0)
    dgated = gf @ wf.T
    dvalue = dgated * act
    pdf = jnp.exp(-0.5 * gate * gate) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    dgate = dgated * value * (cdf + gate * pdf)
    dproj = jnp.concatenate([dvalue, dgate], axis=1).astype(proj.dtype)
    return dproj, dw.astype(w.dtype), dbias.astype(bias.dtype)


geglu_matmul.defvjp(_fwd, _bwd)
