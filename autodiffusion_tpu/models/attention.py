"""Cross-attention transformer blocks for the SD UNet (NHWC).

Re-design of ldm/modules/attention.py:37-260: CrossAttention (self or
cross via optional context), GEGLU feed-forward, BasicTransformerBlock
(self-attn -> cross-attn -> FF, each with pre-LayerNorm and residual), and
SpatialTransformer (1x1 conv in/out around a token-space transformer).
Attention softmax runs in float32 under bf16 compute.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .nn import GroupNorm32, zero_init

Dtype = Any


class CrossAttention(nn.Module):
    """softmax(q k^T / sqrt(d)) v with heads; context=None -> self-attention
    (attention.py:152-195). Projections q/k/v have no bias, out has bias."""

    heads: int = 8
    dim_head: int = 64
    # "auto" uses the Pallas kernel on TPU for long sequences (measured 18%
    # faster than XLA's fused attention at T=4096, BENCH_NOTES.md); set
    # False to force the einsum path (bit-stable vs reference tests)
    use_flash: Any = "auto"
    dtype: Dtype = jnp.float32

    def _flash_enabled(self, tq: int, ts: int) -> bool:
        from ..ops import resolve_use_flash
        return resolve_use_flash(self.use_flash, tq, ts, self.dim_head)

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.DenseGeneral(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.DenseGeneral(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.DenseGeneral(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, tq, _ = q.shape
        ts = k.shape[1]
        q = q.reshape(b, tq, self.heads, self.dim_head)
        k = k.reshape(b, ts, self.heads, self.dim_head)
        v = v.reshape(b, ts, self.heads, self.dim_head)
        if self._flash_enabled(tq, ts):
            from ..ops import flash_attention
            out = flash_attention(q.transpose(0, 2, 1, 3),
                                  k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3))
            out = out.transpose(0, 2, 1, 3).reshape(b, tq, inner)
        else:
            scale = self.dim_head ** -0.5
            # accumulate logits in f32 (preferred_element_type) — rounding
            # the bf16 einsum result before the cast would diverge from
            # the flash kernel's f32 logits at the auto-switch point
            logits = jnp.einsum("bthd,bshd->bhts", q, k,
                                preferred_element_type=jnp.float32) * scale
            weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhts,bshd->bthd", weights, v).reshape(b, tq, inner)
        return nn.DenseGeneral(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.DenseGeneral(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU feed-forward, mult=4 (attention.py:50-65)."""

    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, dtype=self.dtype, name="geglu")(x)
        return nn.DenseGeneral(dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> FF with pre-LN residuals
    (attention.py:196-217)."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        # torch nn.LayerNorm default eps is 1e-5 (flax defaults to 1e-6) —
        # the reference blocks use the torch default (attention.py:196-217)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       name=name)
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                               name="attn1")(ln("norm1")(x).astype(x.dtype))
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                               name="attn2")(ln("norm2")(x).astype(x.dtype), context)
        x = x + FeedForward(dtype=self.dtype, name="ff")(
            ln("norm3")(x).astype(x.dtype))
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 proj_in -> transformer over (h w) tokens -> zero-init
    1x1 proj_out + residual (attention.py:218-260)."""

    heads: int
    dim_head: int
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        # CompVis Normalize() is GroupNorm(32, eps=1e-6) — not the 1e-5
        # default (ldm/modules/attention.py:26-27)
        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for d in range(self.depth):
            x = BasicTransformerBlock(self.heads, self.dim_head,
                                      dtype=self.dtype,
                                      name=f"block_{d}")(x, context)
        x = x.reshape(b, h, w, inner)
        x = nn.Conv(c, (1, 1), kernel_init=zero_init, dtype=self.dtype,
                    name="proj_out")(x)
        return x + residual
