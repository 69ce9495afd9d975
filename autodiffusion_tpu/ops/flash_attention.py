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

Numerics: the MXU dots take the INPUT-dtype operands and accumulate in
float32 (`preferred_element_type`) — exactly the einsum path's contract
(models/attention.py: bf16 einsum with f32 accumulation, softmax weights
cast back to the value dtype). The softmax state (max/sum/accumulator)
stays float32. Upcasting operands to f32 *before* the dot — the kernel's
original behavior, restorable with ADT_FLASH_F32_DOTS=1 for A/B runs —
forces the MXU onto its multi-pass f32 path and measured ~2x slower on
the SD 4096-token head-dim-40 shape (BENCH_NOTES "Round-3 SD roofline").
D <= 512 (multi-lane-tile blocks; block sizes are capped harder for
D > 128 so the q/k/v/acc VMEM buffers still fit — the VAE mid-block's
single-head D=512 attention is the motivating shape); T/S are padded to
block multiples with masking.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "resolve_use_flash"]

_NEG_INF = -1e30


def _f32_dots() -> bool:
    """Read the A/B escape hatch (see module docstring). Resolved OUTSIDE
    the jit boundary by flash_attention and threaded through as a static
    argument, so flipping the env var mid-process takes effect on the next
    call (it participates in the jit cache key) and the forward/backward
    always agree within one grad computation."""
    import os
    return os.environ.get("ADT_FLASH_F32_DOTS") == "1"


def resolve_use_flash(use_flash, tq: int, ts: int, head_dim: int, *,
                      max_head_dim: int = 128) -> bool:
    """Resolve a module's use_flash setting ("auto" | True | False) to a bool.

    The ONE gate shared by every attention site (ADM AttentionBlock, SD
    CrossAttention, VAEAttnBlock) so they cannot drift. Hard constraints
    apply even to an explicit True: the Pallas kernel lowers only on TPU,
    and only for head_dim <= max_head_dim (128 for multi-head layers; the
    VAE mid-block passes 512, the kernel's single-head ceiling).

    "auto" additionally requires tq >= ADT_FLASH_MIN_TOKENS (default 1024,
    below which kernel dispatch overhead beats the einsum logits traffic —
    BENCH_NOTES.md ledger) and ts >= min(512, that). Benches set the env
    var to 1<<30 to compile an einsum-only twin of the same math purely to
    COUNT flops (XLA bills Pallas custom calls at zero), so every "auto"
    site MUST consult it or MFU numbers silently undercount.
    """
    if jax.default_backend() != "tpu" or head_dim > max_head_dim:
        return False
    if use_flash == "auto":
        import os
        min_tokens = int(os.environ.get("ADT_FLASH_MIN_TOKENS", "1024"))
        return tq >= min_tokens and ts >= min(512, min_tokens)
    return bool(use_flash)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_i, l_i, *,
                 scale: float, s_valid: int, block_kv: int,
                 want_lse: bool, f32_dots: bool):
    """Grid (BH, T_blocks, S_blocks); S innermost. Scratch carries the
    online-softmax state across S blocks. When want_lse, also emits the
    per-row logsumexp (the FlashAttention-2 residual for the backward)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, _NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    dot_t = jnp.float32 if f32_dots else q_ref.dtype
    q = q_ref[0].astype(dot_t)                                # [bq, d]
    k = k_ref[0].astype(dot_t)                                # [bk, d]
    v = v_ref[0].astype(dot_t)
    # scale applied to the f32-accumulated logits AFTER the dot — the
    # einsum path's exact contract (models/attention.py scales the f32
    # einsum result), so flash vs einsum agree bit-for-bit in the scaling
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
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
        p.astype(dot_t), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        l_safe = jnp.maximum(l_i[...], 1e-30)
        o_ref[0] = (acc[...] / l_safe).astype(o_ref.dtype)
        if want_lse:
            lse_ref[0] = m_i[...] + jnp.log(l_safe)


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_i, l_i,
                        *, scale: float, s_valid: int, block_kv: int,
                        groups: int, head_dim: int, want_lse: bool,
                        f32_dots: bool):
    """Head-PACKED forward for small head dims (VERDICT r3 #3).

    At D < 128 a plain [bq, D] x [D, bk] QK^T dot leaves 1 - D/128 of the
    MXU's 128 contraction lanes idle (D=40: 69% idle; D=64: 50%), and the
    PV dot wastes the same fraction of output lanes — the measured cause of
    SD self-attention running at 19% of peak (BENCH_NOTES "Round-3
    flash-attention dot dtype"). This kernel processes G = floor(128/D)
    heads per grid step with the head axis blocked into the LANE dimension:

      q_ref [1, bq, G*D]   G heads' features concatenated per token
      k_ref/v_ref [1, bk, G*D]

    and the per-head structure preserved by BLOCK-DIAGONAL expansion of the
    KV operands (one shared mask; rows tiled G times, row-segment g keeps
    only column-segment g):

      QK^T: [bq, G*D] x [G*D, G*bk] -> logits [bq, G*bk]  (depth G*D<=128)
      PV:   [bq, G*bk] x [G*bk, G*D] -> acc    [bq, G*D]  (N lanes G*D)

    Cross-head terms hit structural zeros (exact in f32 accumulation), so
    per-head numerics match the unpacked dot up to f32 summation order.
    The online softmax is segmented per head: a static Python loop over G
    operates on lane-tile-aligned [bq, bk] column segments; the softmax
    state m/l is [bq, G]."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    G, D = groups, head_dim

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, _NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    dot_t = jnp.float32 if f32_dots else q_ref.dtype
    q = q_ref[0].astype(dot_t)                           # [bq, G*D]
    k = k_ref[0].astype(dot_t)                           # [bk, G*D]
    v = v_ref[0].astype(dot_t)
    bk = k.shape[0]
    # shared block-diagonal mask: row-segment (of bk rows) g keeps only
    # column-segment (of D cols) g
    row_seg = jax.lax.broadcasted_iota(jnp.int32, (G * bk, G * D), 0) // bk
    col_seg = jax.lax.broadcasted_iota(jnp.int32, (G * bk, G * D), 1) // D
    bd = row_seg == col_seg
    zero = jnp.zeros((), dot_t)
    k_bd = jnp.where(bd, jnp.concatenate([k] * G, axis=0), zero)
    v_bd = jnp.where(bd, jnp.concatenate([v] * G, axis=0), zero)

    logits = jax.lax.dot_general(q, k_bd, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    bq = logits.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
    kv_valid = col + j * block_kv < s_valid
    m_prev, l_prev = m_i[...], l_i[...]                  # [bq, G]
    ps, ms, ls = [], [], []
    for g in range(G):
        seg = jnp.where(kv_valid, logits[:, g * bk:(g + 1) * bk], _NEG_INF)
        m_g = jnp.maximum(m_prev[:, g:g + 1], seg.max(axis=1, keepdims=True))
        p_g = jnp.exp(seg - m_g)
        ps.append(p_g)
        ms.append(m_g)
        ls.append(l_prev[:, g:g + 1] * jnp.exp(m_prev[:, g:g + 1] - m_g)
                  + p_g.sum(axis=1, keepdims=True))
    m_new = jnp.concatenate(ms, axis=1)                  # [bq, G]
    alpha = jnp.exp(m_prev - m_new)
    m_i[...] = m_new
    l_i[...] = jnp.concatenate(ls, axis=1)
    p = jnp.concatenate(ps, axis=1)                      # [bq, G*bk]
    pv = jax.lax.dot_general(p.astype(dot_t), v_bd, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    alpha_b = jnp.concatenate(
        [jnp.broadcast_to(alpha[:, g:g + 1], (bq, D)) for g in range(G)],
        axis=1)                                          # [bq, G*D]
    acc[...] = acc[...] * alpha_b + pv

    @pl.when(j == nk - 1)
    def _():
        l_safe = jnp.maximum(l_i[...], 1e-30)
        l_b = jnp.concatenate(
            [jnp.broadcast_to(l_safe[:, g:g + 1], (bq, D)) for g in range(G)],
            axis=1)
        o_ref[0] = (acc[...] / l_b).astype(o_ref.dtype)
        if want_lse:
            lse_ref[0] = m_i[...] + jnp.log(l_safe)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               dq_acc, *, scale: float, s_valid: int, block_kv: int,
               f32_dots: bool):
    """dq = (p * (dO V^T - delta)) K * scale. Grid (BH, T_blk, S_blk),
    S innermost; dq accumulates in VMEM scratch across S blocks."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    dot_t = jnp.float32 if f32_dots else q_ref.dtype
    q = q_ref[0].astype(dot_t)                          # [bq, d]
    k = k_ref[0].astype(dot_t)                          # [bk, d]
    v = v_ref[0].astype(dot_t)
    do = do_ref[0].astype(dot_t)                        # [bq, d]
    lse = lse_ref[0]                                    # [bq, 1]
    delta = delta_ref[0]                                # [bq, 1]

    # scale the f32 logits after the dot, matching the forward exactly
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    p = jnp.exp(logits - lse)                           # [bq, bk]
    bq = p.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
    p = jnp.where(col + j * block_kv < s_valid, p, 0.0)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_acc[...] += jax.lax.dot_general(ds.astype(dot_t), k,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale: float, s_valid: int, t_valid: int,
                block_q: int, block_kv: int, f32_dots: bool):
    """dk/dv for one KV block, accumulating over T blocks (innermost grid
    axis). p^T is formed directly as exp(scale K Q^T - lse^T)."""
    j = pl.program_id(2)
    nt = pl.num_programs(2)
    i = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dot_t = jnp.float32 if f32_dots else k_ref.dtype
    k = k_ref[0].astype(dot_t)                          # [bk, d]
    v = v_ref[0].astype(dot_t)
    q = q_ref[0].astype(dot_t)                          # [bq, d]
    do = do_ref[0].astype(dot_t)
    # lse/delta refs hold the full [1, 1, t_pad] row (resident across the T
    # loop); slice this T block as a [1, bq] lane-major row — no transpose
    start = pl.multiple_of(j * block_q, block_q)
    lse = lse_ref[0, :, pl.ds(start, block_q)]          # [1, bq]
    delta = delta_ref[0, :, pl.ds(start, block_q)]

    # p^T re-formed from f32 logits scaled AFTER the dot — identical
    # rounding to the forward's p (no fold-into-operand discrepancy)
    logits_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
    p_t = jnp.exp(logits_t - lse)                       # [bk,bq] - [1,bq]
    bk = p_t.shape[0]
    # zero padded t columns and padded s rows
    col = jax.lax.broadcasted_iota(jnp.int32, (bk, block_q), 1)
    p_t = jnp.where(col + j * block_q < t_valid, p_t, 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (bk, block_q), 0)
    p_t = jnp.where(row + i * block_kv < s_valid, p_t, 0.0)

    dv_acc[...] += jax.lax.dot_general(p_t.astype(dot_t), do,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    dp_t = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ds_t = p_t * (dp_t - delta)
    dk_acc[...] += jax.lax.dot_general(ds_t.astype(dot_t), q,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    @pl.when(j == nt - 1)
    def _():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pack_groups(h: int, d: int, pack_heads: bool) -> int:
    """Heads per packed grid step: floor(128/D) capped by the head count
    (padding a 1-head layer would only add work). 1 = use the unpacked
    kernel. D > 64 packs nothing (G would be 1)."""
    if not pack_heads or d > 64:
        return 1
    return max(1, min(128 // d, h))


def _pack_layout(x: jnp.ndarray, G: int) -> jnp.ndarray:
    """[B, H, T, D] -> [B*ceil(H/G), T, G*D]: G consecutive heads' features
    concatenated per token (zero-padded heads when G does not divide H).
    A bandwidth-only XLA transpose — one pass over the tensor, negligible
    next to the attention itself."""
    b, h, t, d = x.shape
    hg = -(-h // G)
    if hg * G != h:
        x = jnp.pad(x, ((0, 0), (0, hg * G - h), (0, 0), (0, 0)))
    x = x.reshape(b, hg, G, t, d).transpose(0, 1, 3, 2, 4)
    return x.reshape(b * hg, t, G * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, block_q, block_kv, interpret, f32_dots=False,
           pack_heads=False):
    return _flash_forward(q, k, v, block_q, block_kv, interpret, f32_dots,
                          pack_heads)[0]


def _flash_fwd(q, k, v, block_q, block_kv, interpret, f32_dots, pack_heads):
    out, lse = _flash_forward(q, k, v, block_q, block_kv, interpret,
                              f32_dots, pack_heads)
    return out, (q, k, v, out, lse)


def _flash_bwd(block_q, block_kv, interpret, f32_dots, pack_heads, res, g):
    """Pallas FlashAttention-2 backward: the [T, S] probability matrix is
    re-formed blockwise from the saved logsumexp, never in HBM — replacing
    the earlier full einsum-recompute fallback that materialized f32
    [B,H,T,S] logits/weights (the dominant HBM traffic of the classifier
    VJP under guidance, jax.grad inside the sampling scan)."""
    q, k, v, o, lse = res
    b, h, t, d = q.shape
    s = k.shape[2]
    # the backward's optimum differs from the forward's (smaller q blocks
    # win: bq=512 measured 18% faster than 1024 at T=1024 on v5e); choose
    # independently of the forward blocks unless explicitly overridden,
    # under the same VMEM budget rule as the forward
    block_kv = min(block_kv, max(128, s))
    if d > 128:
        # dk/dv f32 accumulators are [bk, d] each: cap both blocks
        block_kv = min(block_kv, 512)
        block_q = min(block_q, 256)
    budget = (1 << 20) if q.dtype == jnp.bfloat16 else (1 << 19)
    cap = max(128, min(512, budget // block_kv))
    block_q = min(block_q, cap, max(128, t)) if block_q >= 512 \
        else min(block_q, max(128, t))
    scale = 1.0 / np.sqrt(d)
    lse = lse[:, :t]                       # strip the forward's padding

    qp = _pad_to(q.reshape(b * h, t, d), 1, block_q)
    dop = _pad_to(g.reshape(b * h, t, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, s, d), 1, block_kv)
    vp = _pad_to(v.reshape(b * h, s, d), 1, block_kv)
    t_pad, s_pad = qp.shape[1], kp.shape[1]
    bh = b * h

    # delta_i = dO_i . O_i  (FlashAttention-2 eq. for dS); tiny elementwise
    delta = (g.astype(jnp.float32) * o.astype(jnp.float32)).sum(-1)
    delta = _pad_to(delta.reshape(bh, t), 1, block_q)
    lse = _pad_to(lse, 1, block_q)
    lse_col, delta_col = lse[..., None], delta[..., None]

    grid_dq = (bh, t_pad // block_q, s_pad // block_kv)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, s_valid=s,
                          block_kv=block_kv, f32_dots=f32_dots),
        grid=grid_dq,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, tq, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, tq, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, tq, j: (i, tq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, dop, lse_col, delta_col)

    grid_dkv = (bh, s_pad // block_kv, t_pad // block_q)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, s_valid=s, t_valid=t,
                          block_q=block_q, block_kv=block_kv,
                          f32_dots=f32_dots),
        grid=grid_dkv,
        in_specs=[
            pl.BlockSpec((1, block_kv, d), lambda i, sb, j: (i, sb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, sb, j: (i, sb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, sb, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, sb, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, sb, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, sb, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d), lambda i, sb, j: (i, sb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, sb, j: (i, sb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((bh, s_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, s_pad, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_kv, d), jnp.float32),
                        pltpu.VMEM((block_kv, d), jnp.float32)],
        interpret=interpret,
    )(kp, vp, qp, dop, lse[:, None, :], delta[:, None, :])

    return (dq[:, :t].reshape(b, h, t, d),
            dk[:, :s].reshape(b, h, s, d),
            dv[:, :s].reshape(b, h, s, d))


_flash.defvjp(_flash_fwd, _flash_bwd)


_flash_jit = jax.jit(_flash, static_argnums=(3, 4, 5, 6, 7))


def _pack_heads_flag() -> bool:
    """ADT_FLASH_PACK_HEADS=1 enables head packing (A/B escape hatch).
    Resolved outside the jit like _f32_dots, so it is part of the cache
    key.

    Default OFF: measured on v5e (docs/probes/probe_pack_heads.py, round
    5) the packed forward LOSES at both target shapes — SD self-attention
    (D=40, G=3) 10.81 vs 6.83 ms (0.63x) and ADM res-32 (D=64, G=2)
    fwd+bwd 4.67 vs 3.48 ms (0.74x). The packed QK^T executes G x the
    logits FLOPs with (G-1)/G structurally zero, and on the MXU that
    extra arithmetic is not free — the same microbench-win/end-to-end-
    loss shape as fused-norm and im2col (BENCH_NOTES round-3/round-5
    ledger). Shipping this ON unmeasured was the cause of BENCH_r04's
    83.9 imgs/s headline regression (round 3: 89.93)."""
    import os
    return os.environ.get("ADT_FLASH_PACK_HEADS", "0") == "1"


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    *, block_q: int = 1024, block_kv: int = 2048,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v for q [B,H,T,D], k/v [B,H,S,D].

    The ADT_FLASH_F32_DOTS / ADT_FLASH_PACK_HEADS escape hatches are
    resolved HERE (outside the jit) and passed as static arguments, so they
    are part of the jit cache key — flipping them mid-process affects the
    very next call, forward and backward consistently."""
    return _flash_jit(q, k, v, block_q, block_kv, interpret, _f32_dots(),
                      _pack_heads_flag())


def _flash_forward_packed(q, k, v, block_q: int, block_kv: int,
                          interpret: bool, f32_dots: bool, G: int):
    """Head-packed forward dispatch (see _attn_kernel_packed). Returns
    (out [b,h,t,d], lse [b*h, t]) — identical contract to the unpacked
    path, so the (unpacked) backward kernels consume its residuals
    unchanged."""
    b, h, t, d = q.shape
    s = k.shape[2]
    hg = -(-h // G)
    scale = 1.0 / np.sqrt(d)
    gd = G * d
    # the f32 logits tile is [bq, G*bk]: cap the KV block so the packed
    # step still covers G*bk source tokens per grid step, and budget bq
    # against the G-times-wider logits
    block_kv = min(block_kv, 512, max(128, s))
    budget = (1 << 21) if q.dtype == jnp.bfloat16 else (1 << 20)
    block_q = min(block_q, max(128, t),
                  max(128, budget // (G * block_kv)))

    qp = _pad_to(_pack_layout(q, G), 1, block_q)
    kp = _pad_to(_pack_layout(k, G), 1, block_kv)
    vp = _pad_to(_pack_layout(v, G), 1, block_kv)
    t_pad, s_pad = qp.shape[1], kp.shape[1]
    bhg = b * hg

    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel_packed, scale=scale, s_valid=s,
                          block_kv=block_kv, groups=G, head_dim=d,
                          want_lse=True, f32_dots=f32_dots),
        grid=(bhg, t_pad // block_q, s_pad // block_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, gd), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, gd), lambda i, tq, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, gd), lambda i, tq, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, gd), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, G), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((bhg, t_pad, gd), v.dtype),
                   jax.ShapeDtypeStruct((bhg, t_pad, G), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((block_q, gd), jnp.float32),
            pltpu.VMEM((block_q, G), jnp.float32),
            pltpu.VMEM((block_q, G), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)

    o = out[:, :t].reshape(b, hg, t, G, d).transpose(0, 1, 3, 2, 4)
    o = o.reshape(b, hg * G, t, d)[:, :h]
    l = lse[:, :t].reshape(b, hg, t, G).transpose(0, 1, 3, 2)
    l = l.reshape(b, hg * G, t)[:, :h].reshape(b * h, t)
    return o, l


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   block_q: int, block_kv: int, interpret: bool,
                   f32_dots: bool = False, pack_heads: bool = False):
    """Returns (out [b,h,t,d], lse [b*h, t_pad]) — lse is the FA-2 residual
    consumed by _flash_bwd (discarded on the pure-forward path; its write
    traffic is t*4 bytes per row, negligible)."""
    b, h, t, d = q.shape
    s = k.shape[2]
    assert d <= 512, f"head dim {d} > 512: split heads further"
    G = _pack_groups(h, d, pack_heads)
    if G >= 2:
        return _flash_forward_packed(q, k, v, block_q, block_kv, interpret,
                                     f32_dots, G)
    block_kv = min(block_kv, max(128, s))
    # bound the [bq, bk] f32 logits/p tiles by a VMEM budget: larger q
    # blocks win (bq=1024 is 34% faster than 256 at T=1024 on v5e) until
    # the scoped-vmem limit (16M); f32 inputs double the k/v buffers, so
    # they get half the budget (the pre-tuning default bq=256 at bk=2048).
    budget = (1 << 21) if q.dtype == jnp.bfloat16 else (1 << 19)
    if d > 128:
        # q/k/v/acc blocks scale with d (the f32 acc alone is bq*d*4):
        # shrink both blocks so total VMEM stays ~8 MB at d=512
        block_kv = min(block_kv, 1024)
        block_q = min(block_q, 256)
    block_q = min(block_q, max(128, t), max(128, budget // block_kv))
    scale = 1.0 / np.sqrt(d)

    qp = _pad_to(q.reshape(b * h, t, d), 1, block_q)
    kp = _pad_to(k.reshape(b * h, s, d), 1, block_kv)
    vp = _pad_to(v.reshape(b * h, s, d), 1, block_kv)
    t_pad, s_pad = qp.shape[1], kp.shape[1]

    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, s_valid=s,
                          block_kv=block_kv, want_lse=True,
                          f32_dots=f32_dots),
        grid=(b * h, t_pad // block_q, s_pad // block_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, tq, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, tq, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, tq, j: (i, tq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct(qp.shape, v.dtype),
                   jax.ShapeDtypeStruct((b * h, t_pad, 1), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :t].reshape(b, h, t, d), lse[..., 0]
