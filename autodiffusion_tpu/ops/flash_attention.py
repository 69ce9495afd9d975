"""Fused flash attention (Pallas, TPU) for the diffusion attention layers.

One kernel covers the framework's attention shapes (SURVEY.md section 5:
full quadratic attention over <=4096 spatial tokens — ADM QKVAttention and
SD CrossAttention/SpatialTransformer): online-softmax blocked attention, so
the [T, S] logits matrix never materializes in HBM. Inputs are
[B, H, T, D] with optional separate source length S (cross-attention).

Numerics: logits and the softmax state run in float32 regardless of input
dtype (matching the f32-softmax policy of the einsum path); output is cast
back to the value dtype. The kernel requires D <= 128 (one lane tile) and
pads T/S internally to block multiples with -inf masking.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_valid: int,
                 block_kv: int):
    """Grid: (B*H, T_blocks). Refs: q [1, bq, D], k/v [1, S_pad, D]."""
    q = q_ref[0].astype(jnp.float32) * scale
    bq, d = q.shape
    s_pad = k_ref.shape[1]
    n_kv = s_pad // block_kv

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, block_kv]
        # mask padded source positions
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
        logits = jnp.where(col + i * block_kv < s_valid, logits, _NEG_INF)

        m_new = jnp.maximum(m_i, logits.max(axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + p.sum(axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l_i = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    *, block_q: int = 128, block_kv: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v for q [B,H,T,D], k/v [B,H,S,D]."""
    b, h, t, d = q.shape
    s = k.shape[2]
    assert d <= 128, f"head dim {d} > 128: split heads further"
    scale = 1.0 / np.sqrt(d)

    qp = _pad_to(q.reshape(b * h, t, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, s, d), 1, block_kv)
    vp = _pad_to(v.reshape(b * h, s, d), 1, block_kv)
    t_pad = qp.shape[1]

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, s_valid=s,
                          block_kv=block_kv),
        grid=(b * h, t_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp.shape[1], d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp.shape[1], d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, v.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :t].reshape(b, h, t, d)
