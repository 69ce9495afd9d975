"""Stable Diffusion latent UNet (openaimodel) in flax NHWC.

Re-design of ldm/modules/diffusionmodules/openaimodel.py:413-744 with the
v1-inference config defaults (model_channels 320, channel_mult (1,2,4,4),
attention ds (1,2,4) as downsample ratios, SpatialTransformer cross-attn
with context_dim 768, num_heads 8, legacy=False so dim_head = ch//heads).
Reuses the ADM ResBlock (identical topology; use_scale_shift_norm=False in
the SD config) and Up/Downsample from models.nn.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .attention import SpatialTransformer
from .nn import Downsample, GroupNorm32, Upsample, timestep_embedding, zero_init
from .unet import ResBlock

Dtype = Any


class SDUNetModel(nn.Module):
    """__call__(x [B,H,W,in_ch], timesteps [B], context [B,T,context_dim])
    -> [B,H,W,out_ch] float32."""

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_ds: Tuple[int, ...] = (1, 2, 4)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    # >0: per-block heads = ch // num_head_channels (the class-cond LDM
    # configs, e.g. cin-ldm-vq-f8 num_head_channels 32); -1: num_heads
    num_head_channels: int = -1
    transformer_depth: int = 1
    context_dim: int = 768
    dropout: float = 0.0
    conv_resample: bool = True
    use_scale_shift_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, *, deterministic: bool = True):
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels, dtype=jnp.float32)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype,
                       name="time_embed_2")(nn.silu(emb))

        def res(h, c_out, name, up=False, down=False):
            return ResBlock(out_channels=c_out, dropout=self.dropout,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=up, down=down, dtype=self.dtype, name=name)(
                h, emb, deterministic=deterministic)

        def attn(h, name):
            ch = h.shape[-1]
            heads = (ch // self.num_head_channels
                     if self.num_head_channels > 0 else self.num_heads)
            return SpatialTransformer(
                heads=heads, dim_head=ch // heads,
                depth=self.transformer_depth, dtype=self.dtype, name=name)(
                h, context)

        x = x.astype(self.dtype)
        ch = self.model_channels
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(x)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h = res(h, ch, f"down_{level}_{i}_res")
                if ds in self.attention_ds:
                    h = attn(h, f"down_{level}_{i}_attn")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(out_channels=ch, use_conv=self.conv_resample,
                               dtype=self.dtype, name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2

        h = res(h, ch, "mid_res0")
        h = attn(h, "mid_attn")
        h = res(h, ch, "mid_res1")

        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = mult * self.model_channels
                h = res(h, ch, f"up_{level}_{i}_res")
                if ds in self.attention_ds:
                    h = attn(h, f"up_{level}_{i}_attn")
                if level and i == self.num_res_blocks:
                    h = Upsample(out_channels=ch, use_conv=self.conv_resample,
                                 dtype=self.dtype, name=f"up_{level}_us")(h)
                    ds //= 2

        assert not hs
        h = GroupNorm32(name="out_norm")(h, act="silu")
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=zero_init, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="out_conv")(
            h.astype(jnp.float32))
