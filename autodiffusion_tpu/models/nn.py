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
from typing import Any, Optional

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


class GroupNorm32(nn.Module):
    """32-group GroupNorm computed in float32 regardless of input dtype."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        h = nn.GroupNorm(num_groups=min(self.num_groups, x.shape[-1]),
                         epsilon=self.epsilon, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return h.astype(orig_dtype)


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
            x = nn.Conv(self.out_channels or c, (3, 3), padding=1,
                        dtype=self.dtype, name="conv")(x)
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
