"""Fused multi-head attention as a Pallas TPU kernel.

The reference computes attention as five separate torch ops with two
(n_head*bs, T, ...) bmm reshapes (transformer_module.py:71-88).  Here the
whole scores -> masked softmax -> context chain runs in one VMEM-resident
kernel per (batch, head): at the EgoEgo scale (T <= 121 tokens, d_k <= 256)
Q/K/V/scores all fit in VMEM simultaneously, so the kernel is purely
MXU-bound with zero HBM traffic between the two matmuls.

Sequences are padded to the 128-lane tile; padded KEY positions are masked
to -inf before the softmax (exact — padded QUERY rows produce garbage that
the caller slices off, matching the reference's output-side padding-mask
semantics where padding influence enters only through zeroed layer outputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, scale: float):
    q = q_ref[0]  # (Tp, Dk)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (Tp, Tp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < t_real, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: Array, k: Array, v: Array, interpret: bool = False) -> Array:
    """q, k: (B, H, T, Dk); v: (B, H, T, Dv) -> (B, H, T, Dv).

    Unmasked full attention with 1/sqrt(Dk) scaling (the reference's
    temperature, transformer_module.py:52).
    """
    b, h, t, dk = q.shape
    dv = v.shape[-1]
    tp = max(_round_up(t, 128), 128)
    scale = 1.0 / (dk ** 0.5)

    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
    qp = pad(q).reshape(b * h, tp, dk)
    kp = pad(k).reshape(b * h, tp, dk)
    vp = pad(v).reshape(b * h, tp, dv)

    out = pl.pallas_call(
        functools.partial(_mha_kernel, t_real=t, scale=scale),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tp, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, tp, dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, tp, dv), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tp, dv), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, dv), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (tp * tp * dk + tp * tp * dv),
            bytes_accessed=4 * b * h * tp * (2 * dk + 2 * dv),
            transcendentals=b * h * tp * tp,
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, tp, dv)[:, :, :t, :]


def reference_attention(q: Array, k: Array, v: Array) -> Array:
    """The plain einsum path (used on CPU and as the kernel oracle)."""
    dk = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (dk ** 0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
