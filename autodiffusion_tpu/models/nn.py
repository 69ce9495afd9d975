"""NN primitives shared by the diffusion models (TPU-idiomatic, NHWC).

Functional equivalents of guided_diffusion/nn.py:17-170 (GroupNorm32, SiLU,
zero_module, timestep_embedding) re-expressed for flax/linen. Conventions:

  * layout is NHWC (TPU conv-friendly), vs the reference's NCHW;
  * normalization always runs in float32 even under a bfloat16 compute policy
    (the GroupNorm32 trick, nn.py:17-19) — bf16 replaces the reference's fp16
    + dynamic loss scaling, which bf16 does not need (fp16_util.py);
  * "zero module" init (nn.py:68) becomes zero kernel/bias initializers on
    the final projection of every residual branch.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

zero_init = nn.initializers.zeros_init()


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       dtype: Dtype = jnp.float32) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, [N] -> [N, dim].

    Matches guided_diffusion/nn.py:103-121: frequencies
    exp(-ln(max_period) * i / half) for i < half, concatenated as
    [cos | sin], zero-padded if dim is odd. Computed in float32.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


class _GNParams(nn.Module):
    """Parameter holder with flax nn.GroupNorm's exact tree (scale, bias) —
    named ``GroupNorm_0`` by its parent so published-checkpoint converters
    (models/convert.py:57, models/sd_convert.py:43) keep working."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32))


def _group_stats(x: jnp.ndarray, groups: int,
                 epsilon: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared [B, G] GroupNorm statistics (f32 fast-variance math).

    Single source of truth for both GroupNorm32 paths (the default
    normalize path and the return_affine fold) so epsilon handling and
    the variance clamp can never drift between them. Returns
    ``(xg, mu, rstd)`` with ``xg`` of shape [B, -1, G, C//G] and
    ``mu``/``rstd`` of shape [B, G].
    """
    b, c = x.shape[0], x.shape[-1]
    xg = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mu = jnp.mean(xg, axis=(1, 3))
    var = jnp.maximum(jnp.mean(xg * xg, axis=(1, 3)) - mu * mu, 0.0)
    return xg, mu, jax.lax.rsqrt(var + epsilon)


class GroupNorm32(nn.Module):
    """32-group GroupNorm in float32, with inline FiLM + activation.

    ``__call__(x, scale=, shift=, act=)`` computes
    ``act(GN(x) * (1 + scale) + shift)`` — the ResBlock scale-shift-norm
    pattern (guided_diffusion/unet.py:216-252) — in one place so the whole
    sequence compiles as one fusion cluster. The default implementation is a
    hand-rolled reshape-to-groups composition (flax nn.GroupNorm's exact
    fast-variance math and op order, f32 stats, then FiLM/SiLU in the
    compute dtype): measured on v5e it fuses better than the stock
    nn.GroupNorm lowering (+4.5% end-to-end guided-sampling throughput) and
    also beats the project's own Pallas slab kernel (ops/fused_norm.py,
    opt-in via ADT_FUSED_NORM=1 — see BENCH_NOTES.md postmortem).
    scale/shift are [B, C]; act is "silu" or None.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    use_fused: Any = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, scale: Optional[jnp.ndarray] = None,
                 shift: Optional[jnp.ndarray] = None,
                 act: Optional[str] = None,
                 return_affine: bool = False) -> jnp.ndarray:
        from ..ops.fused_norm import fused_group_norm, fused_norm_available

        c = x.shape[-1]
        groups = min(self.num_groups, c)
        gamma, beta = _GNParams(c, name="GroupNorm_0")()

        if return_affine:
            # Fold the whole normalize+FiLM into ONE per-(batch, channel)
            # f32 affine (a, b) with GN(x)*(1+scale)+shift == x*a + b, for
            # the epilogue-ingesting conv (ops/conv_im2col.py
            # conv3x3_fused): the consumer applies act(x*a+b) inside its
            # own VMEM pass. Stats use the exact f32 fast-variance math of
            # the default path below; the fold applies FiLM in f32 where
            # the default path applies it after the compute-dtype cast —
            # one bf16 rounding step more precise, only reachable behind
            # the ADT_FUSED_CONV gate.
            b = x.shape[0]
            _, mu, rstd = _group_stats(x, groups, self.epsilon)  # [B, G]
            per_c = c // groups
            rstd_c = jnp.repeat(rstd, per_c, axis=1)             # [B, C]
            mu_c = jnp.repeat(mu, per_c, axis=1)
            a = rstd_c * gamma[None]
            off = beta[None] - mu_c * a
            if scale is not None:
                film = 1.0 + scale.reshape(b, c).astype(jnp.float32)
                a = a * film
                off = off * film
            if shift is not None:
                off = off + shift.reshape(b, c).astype(jnp.float32)
            return a, off

        fused = (fused_norm_available(x.shape, groups)
                 if self.use_fused == "auto" else bool(self.use_fused))
        if fused:
            return fused_group_norm(
                x, gamma, beta,
                scale=None if scale is None else scale.reshape(x.shape[0], c),
                shift=None if shift is None else shift.reshape(x.shape[0], c),
                num_groups=groups, eps=self.epsilon,
                act="silu" if act == "silu" else "none",
                interpret=jax.default_backend() != "tpu")

        # Default: hand-rolled flax-GroupNorm math (f32 stats, exact flax op
        # order), then FiLM/act in the compute dtype, all left to XLA's own
        # fusion and autodiff. A residual-slim custom-VJP variant (backward
        # recomputing xhat/z/u from x) was built and measured SLOWER
        # end-to-end (85.6 vs 88.0 imgs/s): XLA's autodiff of this
        # composition already beats hand-slimmed residuals, and the
        # custom_vjp boundary costs fusion — see BENCH_NOTES.md.
        orig_dtype = x.dtype
        b = x.shape[0]
        xg, mu, rstd = _group_stats(x, groups, self.epsilon)
        mu = mu[:, None, :, None]
        mul = rstd[:, None, :, None] * gamma.reshape(1, 1, groups, -1)
        h = ((xg - mu) * mul + beta.reshape(1, 1, groups, -1))
        h = h.reshape(x.shape).astype(orig_dtype)
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        if scale is not None:
            h = h * (1 + scale.reshape(bshape))
        if shift is not None:
            h = h + shift.reshape(bshape)
        if act == "silu":
            h = nn.silu(h)
        return h


class Conv3x3(nn.Module):
    """Drop-in stride-1 3x3 SAME conv with an optional Pallas im2col path.

    Parameter tree (kernel [3,3,Cin,Cout] f32, bias [Cout] f32 under this
    module's name) is byte-identical to ``nn.Conv(features, (3,3),
    padding=1)`` so every published-checkpoint converter keeps working.
    The forward dispatches through ops.resolve_use_im2col — the ONE gate
    for the implicit-im2col kernel (ops/conv_im2col.py); default "auto" is
    off until the on-chip measurement lands (ADT_IM2COL_CONV=1 to enable).
    The fallback is flax nn.Conv's exact lowering (lax.conv_general_dilated
    NHWC/HWIO + bias add after dtype promotion).
    """

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    use_im2col: Any = "auto"
    use_fused: Any = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, affine=None,
                 residual: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..ops.conv_im2col import (_xla_conv3x3, _xla_fused_ref, conv3x3,
                                       conv3x3_fused, resolve_use_fused_conv,
                                       resolve_use_im2col)

        b, h, w, c_in = x.shape
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if affine is not None:
            # norm-act-conv(-residual) fusion: the caller passes the raw
            # (pre-norm) x plus GroupNorm32(return_affine=True)'s folded
            # (a, b); silu(x*a+b) happens inside the conv pass. The
            # non-gated fallback is the identical math in XLA ops, so the
            # call sites stay one code path.
            a, off = affine
            if resolve_use_fused_conv(self.use_fused, h, w, c_in,
                                      self.features, x.dtype):
                return conv3x3_fused(x, a, off, kernel, bias, residual)
            return _xla_fused_ref(x, a, off, kernel, bias, residual)
        assert residual is None, "residual fusion needs affine"
        if resolve_use_im2col(self.use_im2col, h, w, c_in, self.features,
                              x.dtype):
            return conv3x3(x, kernel, bias)
        return _xla_conv3x3(x, kernel, bias)


class Upsample(nn.Module):
    """2x nearest-neighbor upsample, optional 3x3 conv (unet.py:81-109)."""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # 2x nearest-neighbor via broadcast+reshape: identical values to
        # jax.image.resize(method="nearest") but lowers to a copy instead of
        # a gather (4.3x faster on v5e, see BENCH_NOTES.md)
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
        if self.use_conv:
            x = Conv3x3(self.out_channels or c, dtype=self.dtype,
                        name="conv")(x)
        return x


class Downsample(nn.Module):
    """2x downsample: stride-2 3x3 conv or average pool (unet.py:112-140)."""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        if self.use_conv:
            return nn.Conv(self.out_channels or c, (3, 3), strides=(2, 2),
                           padding=1, dtype=self.dtype, name="op")(x)
        assert (self.out_channels or c) == c
        return nn.avg_pool(x, (2, 2), strides=(2, 2))
