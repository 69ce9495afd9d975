"""Fused flash attention (Pallas, TPU) for the diffusion attention layers.

One kernel covers the framework's attention shapes (SURVEY.md section 5:
full quadratic attention over <=4096 spatial tokens — ADM QKVAttention and
SD CrossAttention/SpatialTransformer): online-softmax blocked attention, so
the [T, S] logits matrix never materializes in HBM.

The KV dimension is a *grid* axis (innermost, sequentially iterated on TPU)
with the softmax state carried in VMEM scratch — this rides the Pallas
pipeline's automatic double-buffering of K/V blocks instead of hand-rolled
DMA. Inputs are [B, H, T, D] with optional separate source length S
(cross-attention).

Numerics: logits and the softmax state run in float32 regardless of input
dtype (matching the f32-softmax policy of the einsum path); output is cast
back to the value dtype. Requires D <= 128 (one lane tile); T/S are padded
to block multiples with masking.
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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, acc, m_i, l_i, *,
                 scale: float, s_valid: int, block_kv: int):
    """Grid (BH, T_blocks, S_blocks); S innermost. Scratch carries the
    online-softmax state across S blocks."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, _NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    q = q_ref[0].astype(jnp.float32) * scale            # [bq, d]
    k = k_ref[0].astype(jnp.float32)                    # [bk, d]
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    bq = logits.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
    logits = jnp.where(col + j * block_kv < s_valid, logits, _NEG_INF)

    m_prev, l_prev = m_i[...], l_i[...]
    m_new = jnp.maximum(m_prev, logits.max(axis=1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_i[...] = m_new
    l_i[...] = l_prev * alpha + p.sum(axis=1, keepdims=True)
    acc[...] = acc[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc[...] / jnp.maximum(l_i[...], 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _reference_attention(q, k, v):
    """Differentiable einsum attention (for the custom backward)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) / np.sqrt(d)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, block_q, block_kv, interpret):
    return _flash_forward(q, k, v, block_q, block_kv, interpret)


def _flash_fwd(q, k, v, block_q, block_kv, interpret):
    return _flash(q, k, v, block_q, block_kv, interpret), (q, k, v)


def _flash_bwd(block_q, block_kv, interpret, res, g):
    # backward recomputes attention via the einsum formulation — classifier
    # guidance differentiates through attention (jax.grad inside the
    # sampling scan), so the kernel must be differentiable
    q, k, v = res
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    *, block_q: int = 256, block_kv: int = 2048,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v for q [B,H,T,D], k/v [B,H,S,D]."""
    return _flash(q, k, v, block_q, block_kv, interpret)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   block_q: int, block_kv: int, interpret: bool) -> jnp.ndarray:
    b, h, t, d = q.shape
    s = k.shape[2]
    assert d <= 128, f"head dim {d} > 128: split heads further"
    block_q = min(block_q, max(128, t))
    block_kv = min(block_kv, max(128, s))
    scale = 1.0 / np.sqrt(d)

    qp = _pad_to(q.reshape(b * h, t, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, s, d), 1, block_kv)
    vp = _pad_to(v.reshape(b * h, s, d), 1, block_kv)
    t_pad, s_pad = qp.shape[1], kp.shape[1]

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, s_valid=s,
                          block_kv=block_kv),
        grid=(b * h, t_pad // block_q, s_pad // block_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, tq, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, tq, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, tq, j: (i, tq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :t].reshape(b, h, t, d)
